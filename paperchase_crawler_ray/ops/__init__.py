"""Large-scale training-data operators (dedup / similarity / text / multimodal).

Each operator is a plain ``Dataset -> Dataset`` function built from Ray
Data primitives (``map_batches`` over pyarrow batches, ``groupby``,
broadcast small sides via ``ray.put``), with the partitioning assumption
it relies on documented in its docstring.
"""
