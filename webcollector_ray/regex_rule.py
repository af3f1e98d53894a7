"""RegexRule — +/- regex rule sets with full-match semantics.

Reference: util/RegexRule.java:29-134. A rule string starting with '+'
adds a positive regex, '-' adds a negative, anything else is positive
verbatim. `satisfy(s)` is true iff s full-matches at least one positive
and no negative; an empty positive list never satisfies
(RegexRule.java:112-133). Java `Pattern.matches` == `re.fullmatch`.

Vectorized path: `satisfy_many` evaluates a list of strings with the
compiled patterns — used by the parse stage over whole link batches.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence

import numpy as np


class RegexRule:
    def __init__(self, rules=None):
        self.positive: List[str] = []
        self.negative: List[str] = []
        self._pos_c: List[re.Pattern] = []
        self._neg_c: List[re.Pattern] = []
        if rules is None:
            pass
        elif isinstance(rules, str):
            self.add_rule(rules)
        elif isinstance(rules, Iterable):
            for r in rules:
                self.add_rule(r)
        else:
            raise TypeError(f"bad rules: {rules!r}")

    def is_empty(self) -> bool:
        return not self.positive  # RegexRule.java:48-50

    def add_rule(self, rule: str) -> "RegexRule":
        if len(rule) == 0:
            return self
        if rule[0] == "+":
            return self.add_positive(rule[1:])
        if rule[0] == "-":
            return self.add_negative(rule[1:])
        return self.add_positive(rule)

    def add_positive(self, regex: str) -> "RegexRule":
        self.positive.append(regex)
        self._pos_c.append(re.compile(regex))
        return self

    def add_negative(self, regex: str) -> "RegexRule":
        self.negative.append(regex)
        self._neg_c.append(re.compile(regex))
        return self

    def satisfy(self, s: Optional[str]) -> bool:
        if s is None:
            return False
        for p in self._neg_c:
            if p.fullmatch(s):
                return False
        for p in self._pos_c:
            if p.fullmatch(s):
                return True
        return False

    def satisfy_many(self, strs: Sequence[Optional[str]]) -> np.ndarray:
        """Boolean mask over a batch of strings (compiled patterns reused)."""
        out = np.zeros(len(strs), dtype=bool)
        for i, s in enumerate(strs):
            out[i] = self.satisfy(s)
        return out

    def __getstate__(self):
        return {"positive": self.positive, "negative": self.negative}

    def __setstate__(self, state):
        self.positive = list(state["positive"])
        self.negative = list(state["negative"])
        self._pos_c = [re.compile(p) for p in self.positive]
        self._neg_c = [re.compile(p) for p in self.negative]

    def __repr__(self) -> str:
        return f"RegexRule(+{self.positive}, -{self.negative})"
