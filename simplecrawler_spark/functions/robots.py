"""P2 — robots.txt rule evaluation (reference: ``urlIsAllowed``,
``lib/crawler.js:≈L1060–1080``, delegating to the ``robots-parser`` package;
RFC 9309 longest-match-wins semantics).

Rules arrive as per-host ``disallow``/``allow`` path-pattern arrays (the
``robots`` table, SURVEY.md §1.3 — parsing raw robots.txt bodies into these
arrays is :func:`parse_robots_txt`). Matching: ``*`` wildcard, ``$`` end
anchor, longest (most-specific) rule wins, allow wins ties, no matching rule
→ allowed. One shared implementation for oracle and the Spark-side
vectorized batch evaluator (rules compiled once per host per batch).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd


def parse_robots_txt(body: str, user_agent: str = "*") -> tuple[list[str], list[str], float | None]:
    """Minimal robots.txt → (disallow, allow, crawl_delay) for the most
    specific matching user-agent group (S3 support)."""
    groups: dict[str, tuple[list[str], list[str], float | None]] = {}
    agents: list[str] = []
    cur: tuple[list[str], list[str], float | None] | None = None
    fresh = True
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if fresh or cur is None:
                cur = ([], [], None)
            agents.append(val.lower())
            groups[val.lower()] = cur
            fresh = False
        elif cur is not None:
            fresh = True
            if key == "disallow" and val:
                cur[0].append(val)
            elif key == "allow" and val:
                cur[1].append(val)
            elif key == "crawl-delay":
                try:
                    cur = (cur[0], cur[1], float(val))
                    groups[agents[-1]] = cur
                except ValueError:
                    pass
    ua = user_agent.lower()
    best = None
    for agent in groups:
        if agent != "*" and agent in ua and (best is None or len(agent) > len(best)):
            best = agent
    if best is None and "*" in groups:
        best = "*"
    if best is None:
        return [], [], None
    return groups[best]


@lru_cache(maxsize=65536)
def _rule_regex(rule: str) -> re.Pattern:
    anchored = rule.endswith("$")
    if anchored:
        rule = rule[:-1]
    pat = "".join(".*" if ch == "*" else re.escape(ch) for ch in rule)
    return re.compile("^" + pat + ("$" if anchored else ""))


def _specificity(rule: str) -> int:
    return len(rule.replace("*", "").replace("$", ""))


def robots_allows(path: str, disallow: list[str] | None, allow: list[str] | None) -> bool:
    """RFC 9309 longest-match: most specific matching rule decides; allow
    wins ties; no match → allowed."""
    best_len, best_allow = -1, True
    for rule in disallow or []:
        if _rule_regex(rule).match(path) and _specificity(rule) > best_len:
            best_len, best_allow = _specificity(rule), False
    for rule in allow or []:
        if _rule_regex(rule).match(path) and _specificity(rule) >= best_len:
            best_len, best_allow = _specificity(rule), True
    return best_allow


def robots_allows_batch(
    paths: pd.Series, hosts: pd.Series, disallow: pd.Series, allow: pd.Series
) -> pd.Series:
    """Vectorized batch evaluation: group rows by host, then apply each of
    the host's rules ONCE over the whole group with pandas ``str.match``
    (C-speed regex) and fold the longest-match bookkeeping with numpy —
    per-rule × per-group vectorized passes, never per-row Python (the old
    per-row loop cost ~2 µs × millions of candidates per round). Semantics
    are pinned to the scalar :func:`robots_allows` (cross-checked in
    tests): disallow beats shorter matches, allow wins ties, no match →
    allowed."""
    n = len(paths)
    out = np.ones(n, dtype=bool)
    pv, hv = paths.to_numpy(), hosts.to_numpy()
    dv, av = disallow.to_numpy(), allow.to_numpy()
    order = np.argsort(hv.astype(str), kind="stable")
    i = 0
    while i < n:
        j = i
        h = hv[order[i]]
        while j < n and hv[order[j]] == h:
            j += 1
        idx = order[i:j]
        d, a = dv[idx[0]], av[idx[0]]
        d = list(d) if d is not None else []
        a = list(a) if a is not None else []
        if d or a:
            grp = pd.Series(pv[idx], dtype=object)
            best_len = np.full(len(idx), -1, dtype=np.int64)
            best_allow = np.ones(len(idx), dtype=bool)
            for rule in d:
                m = grp.str.match(_rule_regex(rule)).to_numpy()
                spec = _specificity(rule)
                upd = m & (spec > best_len)
                best_len[upd] = spec
                best_allow[upd] = False
            for rule in a:
                m = grp.str.match(_rule_regex(rule)).to_numpy()
                spec = _specificity(rule)
                upd = m & (spec >= best_len)
                best_len[upd] = spec
                best_allow[upd] = True
            out[idx] = best_allow
        i = j
    return pd.Series(out)
