"""Text analysis for training-data pipelines (SURVEY.md task axis):
token counting, quality stats, language ID, document fingerprinting.

All stateless vectorized ``map_batches`` transforms; the regexes and
frequency profiles are module-level constants compiled once per worker
process (import time), not per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.texthash import rolling_fingerprint, simhash64, stable_hash64

# RE2 (DuckDB regexp_* and Arrow kernels) treats \w as ASCII-only; every
# SQL oracle in __ray_entry__ tokenizes with RE2 '\w+', so the module
# tokenizer is ASCII to agree with the oracles BEYOND the ASCII fixture
# corpus (unicode \w+ diverges on any accented/CJK word).
_WORD_RE = re.compile(r"\w+", re.ASCII)
# kept as an explicit alias for ops documented against Arrow-built
# vocabularies (BPE/LM score-apply parity)
_ASCII_WORD_RE = _WORD_RE

def _texts(batch: pa.Table, col: str) -> list[str]:
    """Null-safe text column accessor: null -> '' (every textual op in
    this module treats missing text as empty, matching the SQL twins'
    COALESCE-free behavior on the null-free driver tables while never
    crashing on real-world nulls)."""
    return [t or "" for t in batch.column(col).to_pylist()]

# ASCII for the same RE2-parity reason as _WORD_RE (oracle: '[^\w\s]')
_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)

# Small stopword list — part of the op's spec (mirrored in the SQL oracle).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Tiny per-language character/digraph profiles for the n-gram heuristic
# language ID. Public-knowledge frequency facts; scores are deterministic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "th"),
    "de": ("der", "und", "sch", "ein", "ch"),
    "fr": ("les", "ent", "que", "eau", "ou"),
    "es": ("los", "que", "cion", "ado", "ll"),
    "zh": (),  # detected by CJK codepoint ratio instead
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = _texts(batch, text_col)
    n = np.array([len(_WORD_RE.findall(t)) for t in texts], np.int64)
    return batch.append_column("n_tokens", pa.array(n, pa.int64()))


def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality components (ints so the SQL oracle compares
    exactly): token count, distinct tokens, stopword hits, punct chars."""
    texts = _texts(batch, text_col)
    n_tok = np.empty(len(texts), np.int64)
    n_uniq = np.empty(len(texts), np.int64)
    n_stop = np.empty(len(texts), np.int64)
    n_punct = np.empty(len(texts), np.int64)
    stop = set(STOPWORDS)
    for i, t in enumerate(texts):
        toks = [w.lower() for w in _WORD_RE.findall(t)]
        n_tok[i] = len(toks)
        n_uniq[i] = len(set(toks))
        n_stop[i] = sum(1 for w in toks if w in stop)
        n_punct[i] = len(_PUNCT_RE.findall(t))
    out = batch.append_column("n_tokens", pa.array(n_tok, pa.int64()))
    out = out.append_column("n_uniq", pa.array(n_uniq, pa.int64()))
    out = out.append_column("n_stop", pa.array(n_stop, pa.int64()))
    return out.append_column("n_punct", pa.array(n_punct, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scalar quality score in [0,1]: lexical diversity x stopword
    plausibility x length factor. Deterministic; rows-only checked."""
    s = quality_stats_batch(batch, text_col)
    n_tok = s.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    n_uniq = s.column("n_uniq").to_numpy(zero_copy_only=False).astype(np.float64)
    n_stop = s.column("n_stop").to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        diversity = np.where(n_tok > 0, n_uniq / n_tok, 0.0)
        stop_ratio = np.where(n_tok > 0, n_stop / n_tok, 0.0)
    length_factor = np.clip(n_tok / 64.0, 0.0, 1.0)
    plaus = 1.0 - np.abs(stop_ratio - 0.08) / 0.92
    score = np.clip(diversity * 0.5 + plaus * 0.25 + length_factor * 0.25, 0, 1)
    return batch.append_column("quality", pa.array(score, pa.float64()))


def language_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic n-gram language ID -> ``lang_pred`` column.

    CJK codepoint ratio decides zh; otherwise the marker-n-gram density
    argmax (ties broken by language name for determinism).
    """
    texts = _texts(batch, text_col)
    preds = []
    for t in texts:
        low = t.lower()
        if not low.strip():
            preds.append("und")
            continue
        cjk = sum(1 for ch in low if "一" <= ch <= "鿿")
        if cjk / max(1, len(low)) > 0.1:
            preds.append("zh")
            continue
        best, best_score = "und", 0.0
        for lang in sorted(_LANG_MARKERS):
            markers = _LANG_MARKERS[lang]
            if not markers:
                continue
            score = sum(low.count(m) * len(m) for m in markers) / max(1, len(low))
            if score > best_score:
                best, best_score = lang, score
        preds.append(best)
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Winnowing rolling-hash fingerprint + simhash + exact text hash."""
    texts = _texts(batch, text_col)
    fp = np.array([rolling_fingerprint(t) for t in texts], np.int64)
    sh = np.array([simhash64(t) for t in texts], np.int64)
    xh = np.array([stable_hash64(t) for t in texts], np.int64)
    out = batch.append_column("fingerprint", pa.array(fp, pa.int64()))
    out = out.append_column("simhash", pa.array(sh, pa.int64()))
    return out.append_column("text_hash", pa.array(xh, pa.int64()))


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           ) -> pa.Table:
    """Gopher-style per-document repetition components, as INTEGERS so
    the SQL oracle compares exactly: total tokens, distinct tokens, and
    the count of the single most frequent token. ``kept`` applies the
    integer-ratio filter rule (distinct/total >= 0.25 AND top/total <=
    0.5) with cross-multiplied thresholds — no float division."""
    texts = _texts(batch, text_col)
    n = np.empty(len(texts), np.int64)
    nd = np.empty(len(texts), np.int64)
    top = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = _WORD_RE.findall(t.lower())
        n[i] = len(toks)
        if toks:
            _, counts = np.unique(toks, return_counts=True)
            nd[i] = len(counts)
            top[i] = counts.max()
        else:
            nd[i] = 0
            top[i] = 0
    kept = ((nd * 4 >= n) & (top * 2 <= n) & (n > 0)).astype(np.int64)
    return pa.table({c: batch.column(c) for c in batch.column_names} | {
        "n_tokens": pa.array(n), "n_distinct": pa.array(nd),
        "top_count": pa.array(top), "kept": pa.array(kept)})


def repetition_stats(ds: ray.data.Dataset, text_col: str = "text"
                     ) -> ray.data.Dataset:
    return ds.map_batches(lambda b: repetition_stats_batch(b, text_col),
                          batch_format="pyarrow")


def replicate_by_weight(ds: ray.data.Dataset, weight_fn,
                        copy_col: str = "copy") -> ray.data.Dataset:
    """Epoch/domain mixture builder: emit each row ``w`` times (w >= 0,
    from ``weight_fn(batch) -> int64 array``) with a 0-based copy index
    — the deterministic up/down-weighting pass a training-data pipeline
    runs to hit per-source mixture targets. Stateless explode: blocks
    grow by the mean weight, nothing shuffles."""

    def rep(b: pa.Table) -> pa.Table:
        w = np.asarray(weight_fn(b), np.int64)
        if (w < 0).any():
            raise ValueError("mixture weights must be >= 0")
        idx = np.repeat(np.arange(b.num_rows), w)
        out = b.take(pa.array(idx))
        starts = np.repeat(np.cumsum(w) - w, w)
        copy = np.arange(len(idx)) - starts
        return out.append_column(copy_col, pa.array(copy, pa.int64()))

    return ds.map_batches(rep, batch_format="pyarrow")


def unigram_logprob_score(ds: ray.data.Dataset, text_col: str = "text",
                          out_col: str = "logprob"
                          ) -> ray.data.Dataset:
    """Perplexity-proxy quality score (CCNet-style): fit a unigram LM on
    the corpus (ONE distributed token count), broadcast the log-prob
    table, then score each doc with its mean token log-probability.

    The vocabulary is small relative to the corpus by Zipf's law, so the
    count table is collected once and ``ray.put`` once; scoring is a
    stateless map. Float sums are PER-DOCUMENT (row-local, fixed token
    order), so results are deterministic across any parallelism — the
    same float policy the driver contract uses."""
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(b.column(text_col)), pattern=r"\W+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"word": toks,
                         "c": pa.array(np.ones(len(toks), np.int64))})

    counts = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("c", alias_name="n"))
    vocab: dict = {}
    total = 0
    for t in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = t if isinstance(t, pa.Table) else pa.table(t)
        for w, c in zip(t.column("word").to_pylist(),
                        t.column("n").to_pylist()):
            vocab[w] = c
            total += c
    words = sorted(vocab)
    logp = {w: float(np.log(vocab[w]) - np.log(total)) for w in words}
    ref = ray.put(logp)

    def score(b: pa.Table) -> pa.Table:
        lp = ray.get(ref)
        texts = _texts(b, text_col)
        out = np.zeros(len(texts), np.float64)
        oov = float(np.log(1.0) - np.log(total + 1))
        for i, t in enumerate(texts):
            # ASCII tokenizer: must match the Arrow-RE2-built vocab
            toks = _ASCII_WORD_RE.findall(t.lower())
            if toks:
                out[i] = np.float64(
                    np.sum(np.array([lp.get(w, oov) for w in toks],
                                    np.float64))
                ) / len(toks)
        return b.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


_KN_BOS = "\x02"          # out-of-alphabet BOS context marker


def kneser_ney_fit(ds: ray.data.Dataset, text_col: str = "text",
                   discount: float = 0.75) -> dict:
    """Fit an interpolated Kneser-Ney BIGRAM LM on the corpus (public
    method: Kneser & Ney 1995; Chen & Goodman 1999) — one model order
    up from ``unigram_logprob_score``, the CCNet-style perplexity
    filter's actual shape. ONE distributed bigram count (explode ->
    groupby sum; each doc contributes (BOS, w0) plus its consecutive
    pairs), then every derived table — context totals c(v), context
    fan-out N1+(v, .), continuation counts N1+(., w) — folds from the
    bigram table on the driver in SORTED key order (deterministic
    floats). The bigram table is vocabulary-bounded, not
    corpus-bounded (Zipf), the same broadcast-size assumption the
    unigram LM documents; at a vocabulary where it no longer fits,
    the scoring join becomes a keyed join — the size switch the
    relational kit already provides. Returns the plain-dict model."""
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        vs, ws = [], []
        for t in _texts(b, text_col):
            toks = _ASCII_WORD_RE.findall(t.lower())
            if not toks:
                continue
            vs.append(_KN_BOS)
            vs.extend(toks[:-1])
            ws.extend(toks)
        return pa.table({
            "v": pa.array(vs, pa.string()),
            "w": pa.array(ws, pa.string()),
            "c": pa.array(np.ones(len(vs), np.int64))})

    counts = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby(["v", "w"]).aggregate(Sum("c", alias_name="n"))
    big: dict[tuple[str, str], int] = {}
    for t in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = t if isinstance(t, pa.Table) else pa.table(t)
        for v, w, n in zip(t.column("v").to_pylist(),
                           t.column("w").to_pylist(),
                           t.column("n").to_pylist()):
            big[(v, w)] = int(n)
    ctx_total: dict[str, int] = {}
    ctx_fanout: dict[str, int] = {}
    cont: dict[str, int] = {}
    for (v, w) in sorted(big):
        n = big[(v, w)]
        ctx_total[v] = ctx_total.get(v, 0) + n
        ctx_fanout[v] = ctx_fanout.get(v, 0) + 1
        cont[w] = cont.get(w, 0) + 1
    return {"bigrams": big, "ctx_total": ctx_total,
            "ctx_fanout": ctx_fanout, "cont": cont,
            "n_bigram_types": len(big), "discount": float(discount)}


def kn_logprob(model: dict, v: str, w: str) -> float:
    """Interpolated-KN bigram log-probability of ``w`` given context
    ``v``: max(c(v,w)-d, 0)/c(v) + d*N1+(v,.)/c(v) * Pcont(w), with
    Pcont(w) = N1+(., w)/|bigram types| and add-one smoothing on the
    continuation table so unseen words score finitely. An unseen
    context backs off to Pcont alone."""
    d = model["discount"]
    bt = model["n_bigram_types"]
    p_cont = (model["cont"].get(w, 0) + 1.0) / (bt + len(model["cont"])
                                                + 1.0)
    cv = model["ctx_total"].get(v, 0)
    if cv == 0:
        return float(np.log(p_cont))
    cvw = model["bigrams"].get((v, w), 0)
    lam = d * model["ctx_fanout"][v] / cv
    return float(np.log(max(cvw - d, 0.0) / cv + lam * p_cont))


def kneser_ney_score(ds: ray.data.Dataset, model: dict,
                     text_col: str = "text",
                     out_col: str = "kn_logprob") -> ray.data.Dataset:
    """Per-doc mean interpolated-KN bigram log-probability (the
    perplexity-filter score): broadcast the fitted tables once via
    ``ray.put``, stateless row-local map — per-doc fixed-order float
    sums, deterministic at any parallelism (the driver-contract float
    policy). Empty docs score 0."""
    ref = ray.put(model)

    def score(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        texts = _texts(b, text_col)
        out = np.zeros(len(texts), np.float64)
        for i, t in enumerate(texts):
            toks = _ASCII_WORD_RE.findall(t.lower())
            if not toks:
                continue
            lp = 0.0
            prev = _KN_BOS
            for w in toks:
                lp += kn_logprob(m, prev, w)
                prev = w
            out[i] = lp / len(toks)
        return b.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def weighted_sample(ds: ray.data.Dataset, id_col: str, weight_col: str,
                    k: int, seed: int = 42) -> ray.data.Dataset:
    """Distributed weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each row gets priority log(u)/w — a
    monotone transform of u^(1/w) — with u a per-id uniform derived
    from a stable seeded hash, and the sample is the global top-k by
    priority. Deterministic (same seed + ids -> same sample at any
    parallelism), one pruned top-k exchange, no driver pass over rows.
    Weights must be positive."""
    from .relational import global_topk

    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        w = b.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if (w <= 0).any():
            raise ValueError("weighted_sample: weights must be > 0")
        h = np.array([stable_hash64(f"{seed}:{i}") for i in ids],
                     np.int64).astype(np.uint64)
        u = (h.astype(np.float64) + 2.0) / (2.0 ** 64 + 4.0)  # in (0,1)
        key = np.log(u) / w
        return b.append_column("_pri", pa.array(key, pa.float64()))

    prio = ds.map_batches(keyed, batch_format="pyarrow")
    return global_topk(prio, [("_pri", True), (id_col, False)], k) \
        .drop_columns(["_pri"])


def _bpe_pair_counts(seqs: dict) -> dict:
    counts: dict = {}
    for word, (syms, freq) in seqs.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _bpe_apply(syms: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_merges(ds: ray.data.Dataset, text_col: str = "text",
               n_merges: int = 20) -> ray.data.Dataset:
    """BPE vocabulary induction (the tokenizer-training op): ONE
    distributed pass builds the word-frequency table (the corpus-scale
    work); the merge loop then runs over that table, which is SMALL by
    Zipf's law relative to the corpus — the same small-side/driver
    switch the mixture and decontamination ops use (HF-style tokenizer
    training works off word counts the same way). Ties break by
    (count desc, pair lexicographic) so the merge sequence is unique.

    Returns the ordered merge table (rank, left, right, count)."""
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(b.column(text_col)), pattern=r"\W+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"word": toks,
                         "c": pa.array(np.ones(len(toks), np.int64))})

    counts = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("c", alias_name="n"))
    seqs: dict = {}
    for t in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = t if isinstance(t, pa.Table) else pa.table(t)
        for w, c in zip(t.column("word").to_pylist(),
                        t.column("n").to_pylist()):
            seqs[w] = (tuple(w) + ("</w>",), c)

    ranks, lefts, rights, bestc = [], [], [], []
    for r in range(n_merges):
        pc_counts = _bpe_pair_counts(seqs)
        if not pc_counts:
            break
        best = min(pc_counts, key=lambda p: (-pc_counts[p], p))
        ranks.append(r)
        lefts.append(best[0])
        rights.append(best[1])
        bestc.append(pc_counts[best])
        seqs = {w: (_bpe_apply(s, best), f) for w, (s, f) in seqs.items()}
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "count": pa.array(bestc, pa.int64())}))


def bpe_token_count(ds: ray.data.Dataset, merges: list[tuple[str, str]],
                    text_col: str = "text", out_col: str = "n_bpe"
                    ) -> ray.data.Dataset:
    """Apply a learned merge list (broadcast once via ``ray.put``) to
    every document and count resulting BPE tokens — the tokenizer
    APPLY side, stateless and corpus-scale."""
    ref = ray.put(list(merges))

    def apply(b: pa.Table) -> pa.Table:
        ms = ray.get(ref)
        texts = _texts(b, text_col)
        out = np.zeros(len(texts), np.int64)
        cache: dict = {}
        for i, t in enumerate(texts):
            n = 0
            # ASCII tokenizer: must match the Arrow-RE2 train side
            for w in _ASCII_WORD_RE.findall(t.lower()):
                if w not in cache:
                    syms = tuple(w) + ("</w>",)
                    for m in ms:
                        syms = _bpe_apply(syms, tuple(m))
                    cache[w] = len(syms)
                n += cache[w]
            out[i] = n
        return b.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow")


def tfidf(ds: ray.data.Dataset, id_col: str = "doc_id",
          text_col: str = "text", round_digits: int = 6,
          n_docs: int | None = None) -> ray.data.Dataset:
    """TF-IDF scoring: one row per distinct (doc, term) with
    ``tfidf = tf * ln(N / df)``, rounded per row so the SQL oracle's
    value-hash compares exactly.

    Scale shape: per-batch tokenize+count emits (doc, term, tf) rows
    (the explode), ONE groupby(term) computes document frequencies, and
    the df table — vocabulary-sized, orders of magnitude smaller than
    the corpus — broadcasts back onto the tf rows via the map-side
    lookup join (no second shuffle). Above a driver-memory-sized
    vocabulary, swap the lookup for ``Dataset.join`` on term."""
    from collections import Counter

    from .relational import broadcast_lookup_join

    if n_docs is None:
        n_docs = ds.count()

    def doc_term_tf(batch: pa.Table) -> pa.Table:
        ids_out, terms_out, tf_out = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        _texts(batch, text_col)):
            for term, k in Counter(
                    w.lower() for w in _WORD_RE.findall(t)).items():
                ids_out.append(i)
                terms_out.append(term)
                tf_out.append(k)
        return pa.table({
            id_col: pa.array(ids_out, batch.schema.field(id_col).type),
            "term": pa.array(terms_out, pa.string()),
            "tf": pa.array(np.asarray(tf_out, np.int64), pa.int64()),
        })

    dt = ds.map_batches(doc_term_tf, batch_format="pyarrow")
    df_ds = dt.groupby("term").count()

    def rename_df(b: pa.Table) -> pa.Table:
        return b.rename_columns(["df" if c == "count()" else c
                                 for c in b.column_names])

    df_small = df_ds.map_batches(rename_df, batch_format="pyarrow")
    joined = broadcast_lookup_join(dt, "term", df_small, "term", ["df"])

    def score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df = batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        val = np.round(tf * np.log(float(n_docs) / df), round_digits)
        return batch.append_column("tfidf", pa.array(val, pa.float64()))

    return joined.map_batches(score, batch_format="pyarrow")


def bigram_counts(ds: ray.data.Dataset, text_col: str = "text"
                  ) -> ray.data.Dataset:
    """N-gram (bigram) frequency table over the corpus: one row per
    distinct adjacent lowercase word pair with its corpus count — the
    language-model statistics pass (and the shingle generator the n-gram
    dedup family builds on).

    Per batch everything is array-at-once: the Arrow regex split gives a
    ListArray whose offsets delimit documents; empty tokens are dropped
    by re-deriving offsets with a cumulative-sum gather, and adjacent
    pairs join with one vectorized elementwise concat — a bigram never
    crosses a document boundary and no Python loop touches a row. The
    wide step is ONE hash aggregate on the bigram string."""

    def explode_bigrams(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), pattern=r"\W+")
        la = pa.concat_arrays([c for c in lists.chunks]) \
            if isinstance(lists, pa.ChunkedArray) else lists
        offs = np.asarray(la.offsets)
        vals = np.asarray(la.values.to_pandas(), dtype=object)
        nonempty = vals != ""
        keep = vals[nonempty]
        ne_cum = np.concatenate([[0], np.cumsum(nonempty)])
        new_offs = ne_cum[offs]
        if len(keep) < 2:
            return pa.table({"bigram": pa.array([], pa.string())})
        # valid[i] <=> token i is not the last token of its document
        valid = np.ones(len(keep), bool)
        valid[new_offs[1:] - 1] = False
        pair_mask = valid[:-1]
        bg = keep[:-1][pair_mask] + " " + keep[1:][pair_mask]
        return pa.table({"bigram": pa.array(bg, pa.string())})

    counts = ds.map_batches(explode_bigrams, batch_format="pyarrow") \
        .groupby("bigram").count()

    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(["c" if c == "count()" else c
                                 for c in b.column_names])

    return counts.map_batches(rn, batch_format="pyarrow")


def token_count(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda b: token_count_batch(b, text_col),
                          batch_format="pyarrow")


def quality_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda b: quality_stats_batch(b, text_col),
                          batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda b: quality_score_batch(b, text_col),
                          batch_format="pyarrow")


def language_id(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda b: language_id_batch(b, text_col),
                          batch_format="pyarrow")


def fingerprints(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda b: fingerprint_batch(b, text_col),
                          batch_format="pyarrow")


def chunk_documents(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 64,
                    stride: int = 48) -> ray.data.Dataset:
    """Sliding-window token chunking — the context-window builder of an
    LLM pretraining pipeline: each document becomes
    ``1 + ceil(max(n_tokens - window, 0) / stride)`` chunks of up to
    ``window`` lowercase tokens starting every ``stride`` tokens
    (overlap = window - stride); empty documents emit no chunks.

    Stateless ``flat``-style map_batches explode (chunk count scales
    with corpus token count, never buffered beyond one input batch);
    the chunk text is the space-join of its tokens, which is what the
    DuckDB list-slice oracle reproduces exactly."""

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, cid_out, text_out, ntok_out = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        for did, text in zip(ids, _texts(batch, text_col)):
            toks = _WORD_RE.findall((text or "").lower())
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 + max(0, -(-(n - window) // stride))
            for i in range(n_chunks):
                piece = toks[i * stride: i * stride + window]
                ids_out.append(did)
                cid_out.append(i)
                ntok_out.append(len(piece))
                text_out.append(" ".join(piece))
        return pa.table({id_col: pa.array(ids_out),
                         "chunk_id": pa.array(cid_out, pa.int64()),
                         "n_chunk_tokens": pa.array(ntok_out, pa.int64()),
                         "chunk_text": pa.array(text_out, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


class _ContaminationFlag:
    """Actor-pool stage: holds the broadcast benchmark shingle-hash
    array (sorted, deduped) once per worker; per batch each corpus doc's
    shingle hashes are membership-checked with ONE np.isin."""

    def __init__(self, bench_ref, id_col: str, text_col: str, n: int):
        self.bench = np.asarray(ray.get(bench_ref))
        self.id_col, self.text_col, self.n = id_col, text_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.texthash import word_shingles, tokens
        ids = batch.column(self.id_col).to_pylist()
        hit_ids = []
        for did, text in zip(ids, _texts(batch, self.text_col)):
            toks = tokens(text or "")
            if len(toks) < self.n:
                continue
            sh = word_shingles(text, self.n)
            if np.isin(sh, self.bench, assume_unique=False).any():
                hit_ids.append(did)
        return pa.table({self.id_col: pa.array(hit_ids)})


def ngram_contamination(corpus: ray.data.Dataset, bench: ray.data.Dataset,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 8) -> ray.data.Dataset:
    """Benchmark decontamination: ids of corpus documents that share at
    least one ``n``-token shingle with any benchmark document (the
    eval-leak filter every LLM training corpus runs).

    Scale shape: the SMALL side (benchmark shingle hashes — eval sets
    are MBs, not TBs) is collected once, uniq'd and broadcast via
    ``ray.put``; the corpus streams through a stateless membership
    check — no shuffle, no pairwise comparison. Docs shorter than ``n``
    tokens can never match (mirrors the SQL shingle generator)."""
    from ..functions.texthash import word_shingles, tokens

    def bench_hashes(batch: pa.Table) -> pa.Table:
        hs = [word_shingles(t, n)
              for t in _texts(batch, text_col)
              if t and len(tokens(t)) >= n]
        out = (np.unique(np.concatenate(hs)) if hs
               else np.empty(0, np.uint64))
        return pa.table({"h": pa.array(out, pa.uint64())})

    parts = [b.column("h").to_numpy()
             for b in bench.map_batches(bench_hashes, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)]
    bench_arr = np.unique(np.concatenate(parts)) if parts else \
        np.empty(0, np.uint64)
    ref = ray.put(bench_arr)
    return corpus.map_batches(
        _ContaminationFlag, fn_constructor_args=(ref, id_col, text_col, n),
        batch_format="pyarrow", concurrency=(1, 4))


# PII detector patterns — deliberately simple, spec'd patterns (RE2
# syntax, no backrefs) so Arrow's count_substring_regex and DuckDB's
# regexp_extract_all (both RE2) count identically. These flag *candidate*
# spans for redaction/review, the usual first pass of a corpus scrub.
PII_PATTERNS: dict[str, str] = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\(?\d{3}\)?[-. ]\d{3}[-. ]?\d{4}",
    "n_ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document PII candidate counts (emails / phone-shaped / IPv4),
    fully vectorized via Arrow's RE2 ``count_substring_regex`` — zero
    Python per row. Counts are non-overlapping matches, matching the
    DuckDB ``len(regexp_extract_all(...))`` oracle exactly."""
    col = batch.column(text_col)
    out = batch
    for name, rx in PII_PATTERNS.items():
        c = pc.cast(pc.count_substring_regex(col, pattern=rx), pa.int64())
        out = out.append_column(name, c)
    total = None
    for name in PII_PATTERNS:
        col_n = out.column(name)
        total = col_n if total is None else pc.add(total, col_n)
    return out.append_column("pii_flag", pc.greater(total, 0))


def pii_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda b: pii_stats_batch(b, text_col),
                          batch_format="pyarrow")


def dup_ngram_stats_batch(batch: pa.Table, text_col: str = "text",
                          ) -> pa.Table:
    """Gopher-style duplicate n-gram components as exact INTEGERS:
    total and duplicated bigram / trigram counts per document
    (duplicated = occurrences beyond each gram's first). The float
    "fraction of duplicate n-grams" filter is then a downstream
    cross-multiplied integer comparison, same pattern as
    ``repetition_stats_batch``."""
    texts = _texts(batch, text_col)
    n2 = np.empty(len(texts), np.int64)
    d2 = np.empty(len(texts), np.int64)
    n3 = np.empty(len(texts), np.int64)
    d3 = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = _WORD_RE.findall((t or "").lower())
        for n, tot, dup in ((2, n2, d2), (3, n3, d3)):
            k = max(0, len(toks) - n + 1)
            tot[i] = k
            if k == 0:
                dup[i] = 0
                continue
            grams = [" ".join(toks[j:j + n]) for j in range(k)]
            dup[i] = k - len(set(grams))
    out = batch.append_column("n_2grams", pa.array(n2, pa.int64()))
    out = out.append_column("dup_2grams", pa.array(d2, pa.int64()))
    out = out.append_column("n_3grams", pa.array(n3, pa.int64()))
    return out.append_column("dup_3grams", pa.array(d3, pa.int64()))


def dup_ngram_stats(ds: ray.data.Dataset, text_col: str = "text",
                    ) -> ray.data.Dataset:
    return ds.map_batches(lambda b: dup_ngram_stats_batch(b, text_col),
                          batch_format="pyarrow")


def _ngram_hash_fn(n: int):
    """Per-doc positional n-gram hashes (ASCII tokens, RE2 parity)."""
    def doc_hashes(text: str) -> np.ndarray:
        toks = _ASCII_WORD_RE.findall((text or "").lower())
        k = len(toks) - n + 1
        if k <= 0:
            return np.empty(0, np.int64)
        return np.fromiter(
            (stable_hash64(" ".join(toks[i:i + n])) for i in range(k)),
            np.int64, count=k)
    return doc_hashes


def _dup_ngram_hashes(ds: "ray.data.Dataset", text_col: str,
                      n: int) -> "ray.data.Dataset":
    """Hashes of n-grams occurring >= 2 times corpus-wide: per-block
    Counter combiner (pre-shrinks within-block repeats) -> ONE keyed
    hash aggregate -> filter, scrubbed for join-side safety."""
    from collections import Counter
    from ray.data.aggregate import Sum
    from .relational import scrub_empty_blocks

    doc_hashes = _ngram_hash_fn(n)

    def partial_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in _texts(batch, text_col):
            c.update(doc_hashes(t).tolist())
        gh = np.fromiter(c.keys(), np.int64, count=len(c))
        cnt = np.fromiter(c.values(), np.int64, count=len(c))
        return pa.table({"gh": pa.array(gh, pa.int64()),
                         "c": pa.array(cnt, pa.int64())})

    counts = ds.map_batches(partial_counts, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("gh").aggregate(Sum("c", alias_name="total"))
    dups = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("total"),
                                            pa.scalar(2))).select(["gh"]),
        batch_format="pyarrow")
    return scrub_empty_blocks(dups)


def corpus_dup_spans(ds: "ray.data.Dataset", id_col: str = "doc_id",
                     text_col: str = "text", n: int = 5,
                     broadcast_max: int = 2_000_000) -> "ray.data.Dataset":
    """CORPUS-wide duplicated-n-gram coverage per document — the
    substring-dedup diagnostic (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): a token position is
    "duplicated" when its n-gram occurs >= 2 times anywhere in the
    corpus (including within the same document). Returns one row per
    document with >= 1 n-gram position: (id, n_pos, n_dup_pos).

    Scale shape: pass 1 explodes (ngram-hash, block-partial count) rows
    — the per-block Counter combiner pre-shrinks within-block repeats —
    into ONE keyed hash aggregate; the duplicated-hash set is then
    broadcast below ``broadcast_max`` rows (sorted int64 array +
    np.isin per batch) or, above it, the position rows route through
    the size-switched keyed `semi_join` + per-doc count (nothing
    corpus-sized on the driver). 64-bit ngram hashes make the count
    table 8 bytes/gram regardless of n.
    """
    _doc_hashes = _ngram_hash_fn(n)
    dups = _dup_ngram_hashes(ds, text_col, n)
    if dups.count() <= broadcast_max:
        arr = np.sort(np.concatenate(
            [b.column("gh").to_numpy(zero_copy_only=False) for b in
             dups.iter_batches(batch_format="pyarrow", batch_size=None)]
            or [np.empty(0, np.int64)]))
        ref = ray.put(arr)

        def stats(batch: pa.Table) -> pa.Table:
            d = ray.get(ref)
            ids, npos, ndup = [], [], []
            for did, t in zip(batch.column(id_col).to_pylist(),
                              _texts(batch, text_col)):
                h = _doc_hashes(t)
                if len(h) == 0:
                    continue
                ids.append(did)
                npos.append(len(h))
                ndup.append(int(np.isin(h, d).sum()))
            return pa.table({
                id_col: pa.array(ids,
                                 batch.schema.field(id_col).type),
                "n_pos": pa.array(npos, pa.int64()),
                "n_dup_pos": pa.array(ndup, pa.int64())})

        return ds.map_batches(stats, batch_format="pyarrow")

    # scale path: explode (id, gh) position rows, keyed semi join against
    # the duplicated set, per-doc counts via two narrow hash aggregates
    from .relational import semi_join

    def explode_pos(batch: pa.Table) -> pa.Table:
        ids, ghs = [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          _texts(batch, text_col)):
            h = _doc_hashes(t)
            ids.extend([did] * len(h))
            ghs.extend(h.tolist())
        return pa.table({id_col: pa.array(ids, batch.schema.field(id_col).type),
                         "gh": pa.array(ghs, pa.int64())})

    pos = ds.map_batches(explode_pos, batch_format="pyarrow")
    totals = pos.groupby(id_col).count()
    dup_counts = semi_join(pos, "gh", dups, "gh", broadcast_max=0) \
        .groupby(id_col).count()
    from .relational import scrub_empty_blocks as _scrub2
    j = _scrub2(totals).join(
        _scrub2(dup_counts), join_type="left_outer", num_partitions=8,
        on=(id_col,), right_on=(id_col,), right_suffix="_d")

    def fin(b: pa.Table) -> pa.Table:
        names = b.column_names
        dcol = "count()_d" if "count()_d" in names else "count()"
        return pa.table({
            id_col: b.column(id_col),
            "n_pos": pc.cast(b.column("count()"), pa.int64()),
            "n_dup_pos": pc.cast(pc.fill_null(b.column(dcol), 0),
                                 pa.int64())})

    return j.map_batches(fin, batch_format="pyarrow")


def remove_dup_spans(ds: "ray.data.Dataset", id_col: str = "doc_id",
                     text_col: str = "text", n: int = 5,
                     broadcast_max: int = 2_000_000) -> "ray.data.Dataset":
    """Substring-level dedup REMOVAL (the cleaning half of
    `corpus_dup_spans`): drop every token covered by an n-gram that
    occurs >= 2 times corpus-wide, emit the surviving tokens re-joined
    with single spaces as ``clean_text`` (+ ``n_removed`` tokens).
    Token-stream rewrite — original inter-token whitespace/punctuation
    is not preserved, the standard contract for token-level dedup.

    Scale shape: duplicated-hash set broadcast below ``broadcast_max``;
    above it the duplicate POSITIONS route through the keyed
    `semi_join`, aggregate to a per-doc position list via the stitched
    `grouped_string_agg`, and re-attach to the docs with one keyed join
    — the duplicated set never touches the driver."""
    doc_hashes = _ngram_hash_fn(n)
    dups = _dup_ngram_hashes(ds, text_col, n)

    def rewrite(text: str, dup_pos: np.ndarray) -> tuple[str, int]:
        toks = _ASCII_WORD_RE.findall((text or "").lower())
        covered = np.zeros(len(toks), bool)
        for i in dup_pos:
            covered[i:i + n] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        return " ".join(kept), int(covered.sum())

    if dups.count() <= broadcast_max:
        arr = np.sort(np.concatenate(
            [b.column("gh").to_numpy(zero_copy_only=False) for b in
             dups.iter_batches(batch_format="pyarrow", batch_size=None)]
            or [np.empty(0, np.int64)]))
        ref = ray.put(arr)

        def clean(batch: pa.Table) -> pa.Table:
            d = ray.get(ref)
            texts_out, removed = [], []
            for t in _texts(batch, text_col):
                h = doc_hashes(t)
                pos = np.flatnonzero(np.isin(h, d))
                ct, nr = rewrite(t, pos)
                texts_out.append(ct)
                removed.append(nr)
            out = batch.append_column("clean_text",
                                      pa.array(texts_out, pa.string()))
            return out.append_column("n_removed",
                                     pa.array(removed, pa.int64()))

        return ds.map_batches(clean, batch_format="pyarrow")

    # keyed scale path
    from .relational import (grouped_string_agg, scrub_empty_blocks,
                             semi_join)

    def explode_pos(batch: pa.Table) -> pa.Table:
        ids, iis, ghs = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          _texts(batch, text_col)):
            h = doc_hashes(t)
            ids.extend([did] * len(h))
            iis.extend(range(len(h)))
            ghs.extend(h.tolist())
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "i": pa.array(iis, pa.int64()),
            "gh": pa.array(ghs, pa.int64())})

    pos = ds.map_batches(explode_pos, batch_format="pyarrow")
    dup_pos = semi_join(pos, "gh", dups, "gh", broadcast_max=0)

    def as_str(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b.column(id_col),
                         "i": b.column("i"),
                         "istr": pc.cast(b.column("i"), pa.string())})

    pos_csv = grouped_string_agg(
        dup_pos.map_batches(as_str, batch_format="pyarrow"),
        id_col, [("i", False)], "istr", sep=",", out_col="dup_csv")
    j = scrub_empty_blocks(ds).join(
        scrub_empty_blocks(pos_csv), join_type="left_outer",
        num_partitions=8, on=(id_col,), right_on=(id_col,),
        right_suffix="_p")

    def clean_joined(batch: pa.Table) -> pa.Table:
        texts_out, removed = [], []
        for t, csv in zip(_texts(batch, text_col),
                          batch.column("dup_csv").to_pylist()):
            pos_arr = np.array([int(x) for x in csv.split(",")],
                               np.int64) if csv else np.empty(0, np.int64)
            ct, nr = rewrite(t, pos_arr)
            texts_out.append(ct)
            removed.append(nr)
        out = batch.drop_columns(["dup_csv"])
        out = out.append_column("clean_text",
                                pa.array(texts_out, pa.string()))
        return out.append_column("n_removed",
                                 pa.array(removed, pa.int64()))

    return j.map_batches(clean_joined, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169 — public method; original implementation not consulted)
# ---------------------------------------------------------------------------

def _dsir_feature_hashes(texts: list[str], buckets: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Hashed unigram+bigram feature stream for a batch: flat
    (doc_index, bucket) pairs. Tokenizer is the corpus-wide ASCII
    word regex (parity with the unigram-LM vocab builder); the bucket
    is a stable cross-process blake2b hash, so features are identical
    at any parallelism."""
    di: list[int] = []
    bk: list[int] = []
    for i, t in enumerate(texts):
        toks = _ASCII_WORD_RE.findall(t.lower())
        hs = [stable_hash64(w) % buckets for w in toks]
        hs += [stable_hash64(a + " " + b) % buckets
               for a, b in zip(toks, toks[1:])]
        di.extend([i] * len(hs))
        bk.extend(hs)
    return (np.asarray(di, np.int64), np.asarray(bk, np.int64))


def _hashed_ngram_dist(ds: ray.data.Dataset, text_col: str,
                       buckets: int) -> np.ndarray:
    """Dense hashed-feature count vector of a corpus: one ``bincount``
    per block (fixed ``buckets x 8`` bytes out regardless of rows),
    a 64-way distributed tree-add, then a driver fold over
    O(merge-tasks) arrays — the histogram-sketch reduce skeleton."""
    def partial(batch: pa.Table) -> pa.Table:
        _, bk = _dsir_feature_hashes(_texts(batch, text_col), buckets)
        cnt = np.bincount(bk, minlength=buckets).astype(np.int64)
        return pa.table({"c": pa.array([cnt.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)

    def add_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(buckets, np.int64)
        for w in batch.column("c").to_pylist():
            acc += np.frombuffer(w, np.int64)
        return pa.table({"c": pa.array([acc.tobytes()], pa.binary())})

    parts = parts.map_batches(add_merge, batch_format="pyarrow",
                              batch_size=64)
    acc = np.zeros(buckets, np.int64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for w in t.column("c").to_pylist():
            acc += np.frombuffer(w, np.int64)
    return acc


def dsir_logweights(raw: ray.data.Dataset, target: ray.data.Dataset,
                    text_col: str = "text", buckets: int = 8192,
                    alpha: float = 1.0,
                    out_col: str = "dsir_logw") -> ray.data.Dataset:
    """Score every raw document with its DSIR importance log-weight:
    ``log w_i = sum_b c_ib (log p_b - log q_b)`` over hashed
    unigram+bigram buckets, where p/q are the Laplace-``alpha``-
    smoothed target/raw bucket distributions (Xie et al. 2023). Two
    corpus reduces (each a fixed ``buckets``-vector tree-add; the
    bucket table is ~64 KB at 8192 — broadcast once), then a stateless
    scoring map; the per-doc float sum is row-local with fixed token
    order, so scores are deterministic at any parallelism (the driver
    float policy). Documents with no tokens score 0 (weight 1)."""
    p_cnt = _hashed_ngram_dist(target, text_col, buckets)
    q_cnt = _hashed_ngram_dist(raw, text_col, buckets)
    logp = np.log(p_cnt + alpha) - np.log(p_cnt.sum() + alpha * buckets)
    logq = np.log(q_cnt + alpha) - np.log(q_cnt.sum() + alpha * buckets)
    ref = ray.put((logp - logq).astype(np.float64))

    def score(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        texts = _texts(batch, text_col)
        di, bk = _dsir_feature_hashes(texts, buckets)
        out = np.zeros(len(texts), np.float64)
        if len(di):
            np.add.at(out, di, r[bk])
        return batch.append_column(out_col, pa.array(out, pa.float64()))

    return raw.map_batches(score, batch_format="pyarrow")


def dsir_select(raw: ray.data.Dataset, target: ray.data.Dataset, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                buckets: int = 8192, alpha: float = 1.0,
                seed: int = 42) -> ray.data.Dataset:
    """DSIR data selection: sample ``k`` raw documents WITHOUT
    replacement with probability proportional to their importance
    weight ``exp(dsir_logw)`` — the Gumbel-top-k trick, entirely in
    log space (no exp overflow at extreme ratios). Each doc's Gumbel
    noise derives from a stable seeded hash of its id, so the sample
    is deterministic at any parallelism; the selection itself is one
    pruned top-k exchange (``global_topk``), never a driver row pass.
    Returns the selected rows with ``dsir_logw`` attached."""
    from .relational import global_topk

    scored = dsir_logweights(raw, target, text_col=text_col,
                             buckets=buckets, alpha=alpha)

    def gumbel(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = np.array([stable_hash64(f"{seed}:{i}") for i in ids],
                     np.int64).astype(np.uint64)
        u = (h.astype(np.float64) + 2.0) / (2.0 ** 64 + 4.0)  # in (0,1)
        g = -np.log(-np.log(u))
        pri = batch.column("dsir_logw").to_numpy(zero_copy_only=False) + g
        return batch.append_column("_pri", pa.array(pri, pa.float64()))

    prio = scored.map_batches(gumbel, batch_format="pyarrow")
    return global_topk(prio, [("_pri", True), (id_col, False)], k) \
        .drop_columns(["_pri"])


# ---------------------------------------------------------------------------
# Model-in-the-loop quality filtering: distributed logistic regression
# over hashed n-gram features (fastText-style linear text classifier —
# public method; no external implementation consulted)
# ---------------------------------------------------------------------------

def _featurize_text(ds: ray.data.Dataset, text_col: str, buckets: int,
                    keep_cols: tuple = ()) -> ray.data.Dataset:
    """One featurize pass: per doc, token-count-normalized hashed
    unigram+bigram features as parallel list columns (f_idx, f_val).
    Row-local float normalization with fixed token order, so features
    are deterministic at any parallelism. The compact plane is what
    the training epochs scan — texts are read ONCE."""
    def feats(batch: pa.Table) -> pa.Table:
        texts = _texts(batch, text_col)
        idx_col, val_col = [], []
        for t in texts:
            di, bk = _dsir_feature_hashes([t], buckets)
            if len(bk):
                u, cnt = np.unique(bk, return_counts=True)
                v = cnt.astype(np.float64) / np.float64(len(bk))
            else:
                u, v = np.empty(0, np.int64), np.empty(0, np.float64)
            idx_col.append(u.astype(np.int32))
            val_col.append(v.astype(np.float32))
        out = pa.table({c: batch.column(c) for c in keep_cols})
        out = out.append_column("f_idx", pa.array(
            [x.tolist() for x in idx_col], pa.list_(pa.int32())))
        return out.append_column("f_val", pa.array(
            [x.tolist() for x in val_col], pa.list_(pa.float32())))

    return ds.map_batches(feats, batch_format="pyarrow")


def _sparse_block(batch: pa.Table) -> tuple:
    """Flatten a featurized block to (doc_idx, bucket, value, n_docs)."""
    fi = batch.column("f_idx")
    lens = pc.list_value_length(fi).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    di = np.repeat(np.arange(len(fi), dtype=np.int64), lens)
    bk = pc.list_flatten(fi).to_numpy(zero_copy_only=False).astype(np.int64)
    vv = pc.list_flatten(batch.column("f_val")) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    return di, bk, vv, len(fi)


def train_text_classifier(ds: ray.data.Dataset, label_col: str = "label",
                          text_col: str = "text", buckets: int = 8192,
                          epochs: int = 30, lr: float = 2.0,
                          l2: float = 1e-6,
                          optimizer: str = "adagrad") -> dict:
    """Train a binary logistic-regression text classifier on hashed
    n-gram features with FULL-BATCH gradient descent: each epoch
    broadcasts (w, b) once via ``ray.put``, every block computes its
    gradient partial fully vectorized (one sparse accumulate in, one
    out — fixed ``buckets``-vector output regardless of rows), and the
    driver folds partials in a CONTENT-SORTED order (lexicographic by
    serialized bytes), so a fixed partitioning reproduces bit-identical
    weights regardless of block arrival order. Texts are featurized
    ONCE into a compact materialized plane; each epoch is one scan of
    that plane. At corpus scale the exchange per epoch is
    blocks x 64 KB — the scans, not the exchange, are the cost, so cap
    ``epochs`` (or pre-sample) exactly as a fastText-style filter run
    would.

    ``optimizer="adagrad"`` (default) applies the diagonal Adagrad
    preconditioner to the driver-side update — essential here because
    token-normalized hashed features (values ~1/doc_len ≈ 0.02) are
    ~50x smaller-scale than the implicit bias feature (1.0), so any
    plain-GD lr large enough to move the weights makes the bias
    oscillate. Adagrad's accumulator runs over the already-folded
    deterministic gradient, so reproducibility is unchanged.
    ``optimizer="gd"`` keeps the plain update. Returns
    {"w", "bias", "losses", "buckets"}."""
    if optimizer not in ("adagrad", "gd"):
        raise ValueError(f"unknown optimizer {optimizer!r}")
    feat = _featurize_text(ds, text_col, buckets,
                           keep_cols=(label_col,)).materialize()
    n_total = feat.count()
    if n_total == 0:
        raise ValueError("train_text_classifier: empty input")
    w = np.zeros(buckets, np.float64)
    bias = 0.0
    acc_w = np.zeros(buckets, np.float64)
    acc_b = 0.0
    losses: list[float] = []
    for _ in range(epochs):
        ref = ray.put((w, bias))

        def grad_partial(batch: pa.Table) -> pa.Table:
            wv, bv = ray.get(ref)
            di, bk, vv, nd = _sparse_block(batch)
            y = batch.column(label_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            z = np.full(nd, bv, np.float64)
            np.add.at(z, di, wv[bk] * vv)
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            g = np.zeros(buckets, np.float64)
            np.add.at(g, bk, r[di] * vv)
            loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
            return pa.table({
                "g": pa.array([g.tobytes()], pa.binary()),
                "gb": pa.array([float(np.sum(r))], pa.float64()),
                "loss": pa.array([loss], pa.float64())})

        blobs = []
        for b in feat.map_batches(grad_partial, batch_format="pyarrow",
                                  batch_size=None).iter_batches(
                batch_format="pyarrow", batch_size=None):
            t = b if isinstance(b, pa.Table) else pa.table(b)
            for gi, gbi, li in zip(t.column("g").to_pylist(),
                                   t.column("gb").to_pylist(),
                                   t.column("loss").to_pylist()):
                blobs.append((gi, gbi, li))
        blobs.sort(key=lambda x: (x[0], x[1]))   # content order: exact
        g = np.zeros(buckets, np.float64)
        gb = 0.0
        loss = 0.0
        for gi, gbi, li in blobs:
            g += np.frombuffer(gi, np.float64)
            gb += gbi
            loss += li
        gw = g / n_total + l2 * w
        gbm = gb / n_total
        if optimizer == "adagrad":
            acc_w += gw * gw
            acc_b += gbm * gbm
            w -= lr * gw / np.sqrt(acc_w + 1e-8)
            bias -= lr * gbm / np.sqrt(acc_b + 1e-8)
        else:
            w -= lr * gw
            bias -= lr * gbm
        losses.append(loss / n_total)
    return {"w": w, "bias": bias, "losses": losses, "buckets": buckets}


def score_text_classifier(ds: ray.data.Dataset, model: dict,
                          text_col: str = "text",
                          out_col: str = "quality_prob"
                          ) -> ray.data.Dataset:
    """Score documents with a trained classifier: broadcast (w, bias)
    once, stateless row-local sigmoid map (deterministic at any
    parallelism — per-doc fixed-order float sums)."""
    buckets = int(model["buckets"])
    ref = ray.put((np.asarray(model["w"], np.float64),
                   float(model["bias"])))

    def score(batch: pa.Table) -> pa.Table:
        wv, bv = ray.get(ref)
        texts = _texts(batch, text_col)
        out = np.empty(len(texts), np.float64)
        for i, t in enumerate(texts):
            di, bk = _dsir_feature_hashes([t], buckets)
            if len(bk):
                u, cnt = np.unique(bk, return_counts=True)
                z = bv + np.float64(
                    np.sum(wv[u] * (cnt.astype(np.float64) / len(bk))))
            else:
                z = bv
            out[i] = 1.0 / (1.0 + np.exp(-z))
        return batch.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (the RefinedWeb / Gopher line-dedup shape:
# public method — corpus-wide removal of repeated paragraphs/lines)
# ---------------------------------------------------------------------------

def paragraph_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n"
                    ) -> ray.data.Dataset:
    """Corpus-wide exact paragraph dedup: split each document on ``sep``,
    keep only the FIRST occurrence — smallest ``(doc_id, idx)`` — of each
    non-empty paragraph corpus-wide, keep empty paragraphs unconditionally
    (they are document structure, not content), and reassemble each
    document's survivors in original order as ``clean_text``. A document
    whose every paragraph was dropped has no kept rows and disappears,
    matching the SQL GROUP-BY twin (q_paragraph_dedup).

    Scale shape: the explode is a stateless ``map_batches``; the winner
    plane is `exact_dedup` keyed on ``(hash64(para), para)`` — the 64-bit
    hash leads the composite so the keyed exchange partitions uniformly
    even when paragraphs share long prefixes, while the paragraph string
    rides along for exactness (no collision risk) and is needed by the
    reassembly anyway; reassembly is the stitched `grouped_string_agg`
    (ONE global sort + per-block partials + keyed stitch). Nothing
    corpus-sized ever lands on the driver. At a 10^10-doc corpus the
    dominant cost is the two keyed exchanges over the paragraph plane,
    both pre-shrunk by the block-local winner combiner inside
    `exact_dedup`."""
    from .relational import exact_dedup, grouped_string_agg

    def explode(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids: list = []
        iis: list[int] = []
        paras: list[str] = []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          _texts(batch, text_col)):
            ps = t.split(sep)
            ids.extend([did] * len(ps))
            iis.extend(range(1, len(ps) + 1))  # 1-based, SQL range() parity
            paras.extend(ps)
        hs = np.fromiter((stable_hash64(p) for p in paras), np.int64,
                         len(paras))
        return pa.table({id_col: pa.array(ids, id_type),
                         "idx": pa.array(iis, pa.int64()),
                         "para": pa.array(paras, pa.string()),
                         "ph": pa.array(hs, pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    nonempty = exploded.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("para"), "")),
        batch_format="pyarrow")
    empties = exploded.map_batches(
        lambda b: b.filter(pc.equal(b.column("para"), "")),
        batch_format="pyarrow")
    winners = exact_dedup(nonempty, keys=["ph", "para"],
                          order_by=[(id_col, False), ("idx", False)])
    kept = winners.union(empties).map_batches(
        lambda b: b.drop_columns(["ph"]), batch_format="pyarrow")
    return grouped_string_agg(kept, id_col, [("idx", False)], "para",
                              sep=sep, out_col="clean_text")


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, arXiv:2112.11446 —
# public rule family; thresholds below are this op's own spec, mirrored
# bit-for-bit by the SQL twin via integer cross-multiplied comparisons)
# ---------------------------------------------------------------------------

_BULLET_PREFIXES = ("- ", "* ")
_ALPHA_RE = re.compile(r"[a-zA-Z]")


def gopher_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer Gopher-rule components per document (all BIGINT so the
    SQL oracle compares exactly) plus the combined ``pass_gopher`` flag.

    Rules (ratios expressed as integer cross-multiplications):
      50 <= n_words <= 100000            word-count band
      3*n_words <= sum_word_len <= 10*n_words   mean word length in [3,10]
      10*n_symbols <= n_words            '#'/'...' symbol-to-word <= 0.1
      10*n_bullet_lines <= 9*n_lines     bullet-line fraction <= 0.9
      10*n_ellipsis_lines <= 3*n_lines   '...'-ending lines <= 0.3
      10*n_alpha_words >= 8*n_words      >= 80% words contain a letter
      n_stop_distinct >= 2               >= 2 distinct stopwords present
    """
    texts = _texts(batch, text_col)
    n = len(texts)
    cols = {k: np.empty(n, np.int64) for k in
            ("n_words", "sum_word_len", "n_alpha_words", "n_symbols",
             "n_lines", "n_bullet_lines", "n_ellipsis_lines",
             "n_stop_distinct", "pass_gopher")}
    stop = set(STOPWORDS)
    for i, t in enumerate(texts):
        words = _WORD_RE.findall(t)
        lines = t.split("\n")
        nw = len(words)
        swl = sum(len(w) for w in words)
        na = sum(1 for w in words if _ALPHA_RE.search(w))
        nsym = t.count("#") + t.count("...")
        nl = len(lines)
        nb = sum(1 for x in lines if x.startswith(_BULLET_PREFIXES))
        ne = sum(1 for x in lines if x.endswith("..."))
        nsd = len({w for w in (w.lower() for w in words) if w in stop})
        ok = (50 <= nw <= 100000 and 3 * nw <= swl <= 10 * nw
              and 10 * nsym <= nw and 10 * nb <= 9 * nl
              and 10 * ne <= 3 * nl and 10 * na >= 8 * nw and nsd >= 2)
        for k, v in (("n_words", nw), ("sum_word_len", swl),
                     ("n_alpha_words", na), ("n_symbols", nsym),
                     ("n_lines", nl), ("n_bullet_lines", nb),
                     ("n_ellipsis_lines", ne), ("n_stop_distinct", nsd),
                     ("pass_gopher", int(ok))):
            cols[k][i] = v
    out = batch
    for k in ("n_words", "sum_word_len", "n_alpha_words", "n_symbols",
              "n_lines", "n_bullet_lines", "n_ellipsis_lines",
              "n_stop_distinct", "pass_gopher"):
        out = out.append_column(k, pa.array(cols[k], pa.int64()))
    return out


def gopher_stats(ds: ray.data.Dataset, text_col: str = "text"
                 ) -> ray.data.Dataset:
    """Per-document Gopher-rule components (stateless map_batches)."""
    return ds.map_batches(lambda b: gopher_stats_batch(b, text_col),
                          batch_format="pyarrow")


def gopher_filter(ds: ray.data.Dataset, text_col: str = "text"
                  ) -> ray.data.Dataset:
    """Keep only documents passing every Gopher rule; drops the helper
    component columns (the filter a 100-TB curation chain composes
    before dedup)."""
    stats_cols = ["n_words", "sum_word_len", "n_alpha_words", "n_symbols",
                  "n_lines", "n_bullet_lines", "n_ellipsis_lines",
                  "n_stop_distinct", "pass_gopher"]

    def keep(b: pa.Table) -> pa.Table:
        s = gopher_stats_batch(b, text_col)
        return s.filter(pc.equal(s.column("pass_gopher"), 1)) \
                .drop_columns(stats_cols)

    return ds.map_batches(keep, batch_format="pyarrow")


# -- C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the
#    Limits of Transfer Learning with a Unified Text-to-Text
#    Transformer", public §2.2 rule list) -------------------------------

_C4_TERMINALS = ('.', '!', '?', '"')
_C4_JS_RE = re.compile(r"\bjavascript\b", re.ASCII)
_C4_STATS_COLS = ["n_lines", "n_kept_lines", "n_sentences",
                  "has_lorem", "has_brace", "pass_c4"]


def c4_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer C4-rule components per document (all BIGINT so the SQL
    oracle compares exactly) plus the combined ``pass_c4`` flag.

    Rules (the paper's public heuristics, deterministically pinned):
      * a LINE is kept iff it ends in a terminal punctuation mark
        ('.', '!', '?', '"'), has >= 5 words, and does not contain the
        word "javascript" (case-insensitive, ASCII word boundary);
      * n_sentences counts terminal '.'/'!'/'?' characters in the doc
        (the paper's "at least 3 sentences" gate, made exact);
      * the DOC passes iff n_sentences >= 3, it contains no curly
        brace, no "lorem ipsum" (case-insensitive), and at least one
        line survives the line filter.
    """
    texts = _texts(batch, text_col)
    n = len(texts)
    cols = {k: np.empty(n, np.int64) for k in _C4_STATS_COLS}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        nk = 0
        for x in lines:
            if (x.endswith(_C4_TERMINALS)
                    and len(_WORD_RE.findall(x)) >= 5
                    and not _C4_JS_RE.search(x.lower())):
                nk += 1
        ns = t.count(".") + t.count("!") + t.count("?")
        low = t.lower()
        lorem = int("lorem ipsum" in low)
        brace = int("{" in t or "}" in t)
        ok = ns >= 3 and not lorem and not brace and nk >= 1
        for k, v in (("n_lines", len(lines)), ("n_kept_lines", nk),
                     ("n_sentences", ns), ("has_lorem", lorem),
                     ("has_brace", brace), ("pass_c4", int(ok))):
            cols[k][i] = v
    out = batch
    for k in _C4_STATS_COLS:
        out = out.append_column(k, pa.array(cols[k], pa.int64()))
    return out


def c4_stats(ds: ray.data.Dataset, text_col: str = "text"
             ) -> ray.data.Dataset:
    """Per-document C4-rule components (stateless map_batches)."""
    return ds.map_batches(lambda b: c4_stats_batch(b, text_col),
                          batch_format="pyarrow")


def c4_clean(ds: ray.data.Dataset, text_col: str = "text",
             out_col: str = "clean_text") -> ray.data.Dataset:
    """The full C4 transform: drop failing documents, and within the
    survivors keep only the surviving lines, reassembled in order with
    '\\n' (the corpus a downstream tokenizer actually sees)."""
    def clean(b: pa.Table) -> pa.Table:
        s = c4_stats_batch(b, text_col)
        s = s.filter(pc.equal(s.column("pass_c4"), 1))
        texts = _texts(s, text_col)
        kept = []
        for t in texts:
            ls = [x for x in t.split("\n")
                  if (x.endswith(_C4_TERMINALS)
                      and len(_WORD_RE.findall(x)) >= 5
                      and not _C4_JS_RE.search(x.lower()))]
            kept.append("\n".join(ls))
        out = s.drop_columns(_C4_STATS_COLS + [text_col])
        return out.append_column(out_col, pa.array(kept, pa.string()))

    return ds.map_batches(clean, batch_format="pyarrow")


def bm25_topk(ds: ray.data.Dataset, queries: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> ray.data.Dataset:
    """BM25 retrieval: top-``k`` documents per query string (Robertson/
    Sparck Jones weighting, the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))``
    idf form). Returns (query_idx, query, doc_id, score, rnk) with
    rnk 1..k per query, ties broken by ascending doc id — deterministic
    at any parallelism, so the naive single-process twin matches
    bit-for-bit (per-doc float math is order-fixed: terms contribute in
    first-appearance order, summed per doc within one block).

    Scale shape (the tfidf/grouped_topk composition):
      1. corpus stats — ONE aggregate over token counts (N, avgdl);
      2. match plane — per-batch tokenize emits (doc, term, tf, dl)
         rows ONLY for the broadcast query-term set (vocabulary-sized
         pruning at the scan; a query set of hundreds keeps this plane
         thousands of times smaller than the corpus token plane);
      3. df — one groupby over the pruned plane's distinct (term, doc)
         rows, vocabulary-of-queries-sized, collected and broadcast;
      4. scores — block-local per-(query, doc) sums (a doc's rows never
         split across blocks: they are emitted by its own batch), so NO
         score shuffle; ``grouped_topk`` prunes to <= k rows per
         (query, block) before its one small exchange.
    """
    from .relational import grouped_topk

    qtoks = [[w.lower() for w in _WORD_RE.findall(q)] for q in queries]
    qterms = sorted({t for ts in qtoks for t in ts})
    qref = ray.put(np.asarray(qterms, dtype=object))

    def _tokens(bt: pa.Table):
        """Arrow RE2 tokenize for the whole batch: returns the flat
        non-empty token array (object dtype) and each token's row
        index — the zero-row-loop split `bigram_counts` established."""
        lists = pc.split_pattern_regex(
            pc.utf8_lower(bt.column(text_col)), pattern=r"\W+")
        la = pa.concat_arrays([c for c in lists.chunks]) \
            if isinstance(lists, pa.ChunkedArray) else lists
        offs = np.asarray(la.offsets)
        vals = np.asarray(la.values.to_pandas(), dtype=object)
        doc_idx = np.repeat(np.arange(bt.num_rows), np.diff(offs))
        nonempty = vals != ""
        return vals[nonempty], doc_idx[nonempty]

    # pass 1: corpus size + average document length (token counts only)
    stats = ds.map_batches(
        lambda bt: pa.table({
            "n": pa.array([bt.num_rows], pa.int64()),
            "dl": pa.array([int(len(_tokens(bt)[0]))], pa.int64())}),
        batch_format="pyarrow")
    tot = stats.sum(["n", "dl"])
    n_docs = int(tot["sum(n)"])
    avgdl = float(tot["sum(dl)"]) / max(1, n_docs)

    # pass 2: (doc, term, tf, dl) rows for query terms only — fully
    # vectorized (split/prune/group via numpy), preserving the naive
    # twin's row order: per doc, terms in FIRST-APPEARANCE order, so
    # score_block's float accumulation order is unchanged.
    def match_plane(bt: pa.Table) -> pa.Table:
        qarr = ray.get(qref)
        empty = pa.table({
            id_col: pa.array([], bt.schema.field(id_col).type),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64())})
        if bt.num_rows == 0:
            return empty
        toks, docs_of = _tokens(bt)
        dl = np.bincount(docs_of, minlength=bt.num_rows).astype(np.int64)
        hit = np.isin(toks, qarr)
        if not hit.any():
            return empty
        md, mt = docs_of[hit], toks[hit]
        ti = np.searchsorted(qarr, mt)
        key = md * np.int64(len(qarr)) + ti
        ukey, first_pos, tf = np.unique(
            key, return_index=True, return_counts=True)
        ud = ukey // len(qarr)
        order = np.lexsort((first_pos, ud))       # doc, then 1st-seen
        ukey, tf, ud = ukey[order], tf[order], ud[order]
        ut = (ukey % len(qarr)).astype(np.int64)
        return pa.table({
            id_col: bt.column(id_col).take(pa.array(ud, pa.int64())),
            "term": pa.array(qarr[ut], pa.string()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "dl": pa.array(dl[ud], pa.int64())})

    plane = ds.map_batches(match_plane, batch_format="pyarrow")
    plane = plane.materialize()     # consumed twice: df + scores

    dft = {r["term"]: r["count()"]
           for r in plane.groupby("term").count().take_all()}
    idf = {t: float(np.log(1.0 + (n_docs - dft.get(t, 0) + 0.5)
                           / (dft.get(t, 0) + 0.5))) for t in qterms}
    idf_ref = ray.put(idf)
    q_of_term: dict[str, list[int]] = {}
    for qi, ts in enumerate(qtoks):
        for t in set(ts):
            q_of_term.setdefault(t, []).append(qi)
    qmap_ref = ray.put(q_of_term)

    def score_block(bt: pa.Table) -> pa.Table:
        idfs, qmap = ray.get(idf_ref), ray.get(qmap_ref)
        ids = bt.column(id_col).to_pylist()
        terms = bt.column("term").to_pylist()
        tf = bt.column("tf").to_numpy(zero_copy_only=False)
        dl = bt.column("dl").to_numpy(zero_copy_only=False)
        contrib = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        acc: dict[tuple[int, object], float] = {}
        for j in range(len(ids)):
            w = idfs[terms[j]] * contrib[j]
            for qi in qmap.get(terms[j], ()):
                key = (qi, ids[j])
                acc[key] = acc.get(key, 0.0) + w
        keys = list(acc.keys())
        return pa.table({
            "query_idx": pa.array([x[0] for x in keys], pa.int64()),
            id_col: pa.array([x[1] for x in keys],
                             bt.schema.field(id_col).type),
            "score": pa.array([acc[x] for x in keys], pa.float64())})

    # batch_size=None pins the block-local invariant score_block relies
    # on (a doc's plane rows all sit in the one block its source batch
    # emitted); row-based re-batching would split a doc's partial sums.
    scored = plane.map_batches(score_block, batch_format="pyarrow",
                               batch_size=None)
    top = grouped_topk(scored, "query_idx", "score", k, descending=True,
                       tie_col=id_col)

    def attach(bt: pa.Table) -> pa.Table:
        qi = bt.column("query_idx").to_numpy(zero_copy_only=False)
        qs = pa.array([queries[int(i)] for i in qi], pa.string())
        idx = pc.sort_indices(bt, sort_keys=[
            ("query_idx", "ascending"), ("score", "descending"),
            (id_col, "ascending")])
        bt = bt.take(idx).append_column("query", qs.take(idx))
        g = bt.column("query_idx").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        rnk = np.arange(len(g), dtype=np.int64) + 1 \
            - np.repeat(starts, np.diff(np.r_[starts, len(g)]))
        return bt.append_column("rnk", pa.array(rnk, pa.int64()))

    # grouped_topk's finish co-locates each query's rows in one block,
    # so the rank assignment is block-local
    return top.map_batches(attach, batch_format="pyarrow",
                           batch_size=None)


def hashed_doc_vectors(ds: ray.data.Dataset, dim: int = 64,
                       id_col: str = "doc_id", text_col: str = "text",
                       out_col: str = "embedding") -> ray.data.Dataset:
    """Feature-hashed document vectors (Weinberger et al. 2009): each
    token maps to bucket ``stable_hash64(tok) % dim`` with a sign bit
    from the next hash bit, weighted ``log1p(tf)``, L2-normalized —
    the dense representation a topic-bucketing / mixture pipeline
    feeds to k-means when no learned embeddings exist. Stateless
    per-batch map; deterministic (the same fixed hash the dedup
    kernels use)."""
    from collections import Counter

    from ..functions.texthash import stable_hash64

    def vecs(b: pa.Table) -> pa.Table:
        out = np.zeros((b.num_rows, dim), np.float64)
        for i, t in enumerate(_texts(b, text_col)):
            for tok, c in Counter(
                    w.lower() for w in _WORD_RE.findall(t)).items():
                h = stable_hash64(tok)
                sign = 1.0 if (h >> 62) & 1 else -1.0
                out[i, h % dim] += sign * np.log1p(np.float64(c))
        n = np.sqrt((out * out).sum(axis=1, keepdims=True))
        n[n == 0] = 1.0
        out = out / n
        # kmeans_distributed's expected key column rides along; ids
        # that aren't numeric (real corpora commonly use string doc
        # ids) get a stable 64-bit hash instead of a cast
        ids = b.column(id_col)
        if pa.types.is_integer(ids.type):
            vec_id = pc.cast(ids, pa.int64())
        else:
            vec_id = pa.array(
                [stable_hash64(s if s is not None else "")
                 for s in ids.to_pylist()], pa.int64())
        return pa.table({
            id_col: ids,
            "vec_id": vec_id,
            out_col: pa.array(list(out), pa.list_(pa.float64()))})

    return ds.map_batches(vecs, batch_format="pyarrow")


def document_clusters(ds: ray.data.Dataset, n_clusters: int = 8,
                      dim: int = 64, iters: int = 8,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> ray.data.Dataset:
    """Topic bucketing for mixture construction: feature-hashed doc
    vectors -> distributed Lloyd k-means -> (doc_id, cluster) — the
    unsupervised domain-bucketing stage a data-mixture pipeline runs
    when no domain labels exist (DoReMi-style weights are then learned
    per bucket).

    Scale shape: ONE stateless vectorize pass; k-means exchanges
    ncell x dim float partials per block per iteration (the corpus
    never moves — `kmeans_distributed`); assignment is a broadcast
    matmul per batch. Float centroids are layout-stable rather than
    layout-independent (see kmeans_distributed), so the query is
    rows-only with a fixed-layout bit-exact pytest twin."""
    from .similarity import kmeans_distributed

    vecs = hashed_doc_vectors(ds, dim=dim, id_col=id_col,
                              text_col=text_col).materialize()
    C = kmeans_distributed(vecs, n_clusters, iters=iters)
    C_ref = ray.put(C)

    def assign(b: pa.Table) -> pa.Table:
        cents = ray.get(C_ref)
        X = np.stack(b.column("embedding").to_pylist())
        cl = (X @ cents.T).argmax(axis=1).astype(np.int64)
        return pa.table({id_col: b.column(id_col),
                         "cluster": pa.array(cl, pa.int64())})

    return vecs.map_batches(assign, batch_format="pyarrow")
