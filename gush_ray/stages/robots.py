"""robots.txt (RFC 9309) parsing + vectorized URL-path filtering.

A crawl-derived corpus must honor (or at least be able to re-check)
robots exclusion: given each site's robots.txt, drop documents whose
path a Disallow rule covers. The reference has no analog (it filters by
table deny-lists — SqlToBinlog.scala:14); this is the webtext-domain
counterpart of that ignore-list filter, built on the PUBLIC RFC 9309 /
original REP semantics:

* group selection: the group whose ``User-agent`` token is the longest
  case-insensitive substring of the caller's agent wins; ``*`` is the
  fallback group. Multiple ``User-agent`` lines stack onto one group.
* rule matching: ``Allow:`` / ``Disallow:`` patterns match from the
  path start; ``*`` matches any octet sequence, a trailing ``$``
  anchors the end. An empty Disallow value allows everything.
* decision: the matching rule with the LONGEST pattern (raw octet
  length, wildcards included) wins; on a tie Allow wins. No matching
  rule → allowed.

The filter stage is vectorized: each site's (few) rules compile once to
anchored regexes, every rule evaluates over the whole batch via
``pc.match_substring_regex``, and the longest-match decision is a
numpy argmax — no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def translate_pattern(pattern: str) -> str:
    """robots path pattern → anchored RE2-safe regex ('*' → '.*',
    trailing '$' → end anchor, everything else literal)."""
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored_end else "")


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """robots.txt text → the effective [(allow, pattern), ...] rule list
    for ``agent`` (most-specific user-agent group, ``*`` fallback)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_rules = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_rules = True
            if field == "disallow" and not value:
                continue  # empty Disallow = no rule (allows everything)
            if value:
                cur_rules.append((field == "allow", value))
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    al = agent.lower()
    best_len, best_rules = -1, []
    for agents, rules in groups:
        for tok in agents:
            if tok == "*":
                if best_len < 0:
                    best_len, best_rules = 0, rules
            elif tok in al and len(tok) > best_len:
                best_len, best_rules = len(tok), rules
    return best_rules


def decide_paths(paths, rules: list[tuple[bool, str]]) -> np.ndarray:
    """Vectorized RFC 9309 decision for an Arrow/np string array of
    URL paths: boolean allowed mask. One regex pass per rule (rules are
    few), longest-pattern-wins with Allow on ties via argmax."""
    arr = paths if isinstance(paths, (pa.Array, pa.ChunkedArray)) \
        else pa.array(paths, type=pa.string())
    n = len(arr)
    if not rules or n == 0:
        return np.ones(n, dtype=bool)
    # score = 2*len(pattern) + (1 if allow): longer pattern dominates,
    # allow wins a same-length tie; score 0 = "no rule matched" = allow
    best_score = np.zeros(n, dtype=np.int64)
    best_allow = np.ones(n, dtype=bool)
    for allow, pattern in rules:
        m = pc.match_substring_regex(arr, translate_pattern(pattern))
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        mask = m.fill_null(False).to_numpy(zero_copy_only=False)
        score = 2 * len(pattern) + (1 if allow else 0)
        upd = mask & (score > best_score)
        best_score[upd] = score
        best_allow[upd] = allow
    return best_allow


class RobotsFilter:
    """Actor-pool ``map_batches`` stage: compile each site's rule list
    once per actor (``__init__``), then per batch extract the path,
    group rows by site, and append an ``allowed`` column (or drop the
    denied rows with ``drop=True``). ``rules_by_site`` is a small
    broadcast side (ray.put once, read per actor) — robots.txt bodies
    are tiny and per-registrable-domain, never a shuffle."""

    def __init__(self, rules_by_site: dict[str, str], url_col: str = "url",
                 agent: str = "*", drop: bool = False):
        self.url_col = url_col
        self.drop = drop
        self.rules = {site: parse_robots(txt, agent)
                      for site, txt in rules_by_site.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col]
        m = pc.extract_regex(
            urls, r"^[a-z]+://(?P<site>[^/]+)(?P<path>/[^#?]*)?")
        sites = pc.struct_field(m, "site").to_numpy(zero_copy_only=False)
        paths = pc.struct_field(m, "path").to_numpy(zero_copy_only=False)
        paths = np.where(pd_isna(paths), "/", paths)
        allowed = np.ones(len(batch), dtype=bool)
        for site in np.unique(sites[~pd_isna(sites)]):
            rules = self.rules.get(site)
            if not rules:
                continue
            sel = sites == site
            allowed[sel] = decide_paths(paths[sel].tolist(), rules)
        if self.drop:
            return batch.filter(pa.array(allowed))
        return batch.append_column("allowed", pa.array(allowed))


def pd_isna(a: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.isna(a)
