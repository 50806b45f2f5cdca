"""Minimal robots.txt parsing (SURVEY.md A2) — shared engine/oracle spec.

Supports the subset the fixtures exercise: ``User-agent: *`` sections with
``Disallow:`` path prefixes and ``Crawl-delay:`` seconds. An empty
Disallow means "allow all". Unknown directives are ignored.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    disallow: list[str] = field(default_factory=list)
    crawl_delay: float = 0.0

    def allowed(self, path: str) -> bool:
        return not any(d and path.startswith(d) for d in self.disallow)


def parse_robots(text: str | bytes) -> RobotsRules:
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    rules = RobotsRules()
    applies = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow":
            if val:
                rules.disallow.append(val)
        elif applies and key == "crawl-delay":
            try:
                rules.crawl_delay = float(val)
            except ValueError:
                pass
    return rules
