"""Minimal pure-Python Aho-Corasick automaton (pickleable, broadcastable).

Built once on the driver from the gazetteer surface forms, shipped to
executors via ``SparkContext.broadcast``, and run inside Arrow-batched
``mapInPandas`` — the pattern mandated by the project input hint (no
per-row Python UDFs; the automaton scan is per-*batch*).

The reference has no matcher (it joins on exact codes); this is the
web-scale generalization: multi-pattern string search in O(text length).
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    """Classic trie + failure-link automaton over unicode strings."""

    def __init__(self, patterns: dict[str, list[int]]):
        """``patterns``: surface form -> payload (candidate entity ids)."""
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[tuple[str, list[int]]]] = [[]]
        self.fail: list[int] = [0]
        for pat, payload in patterns.items():
            if not pat:
                continue
            state = 0
            for ch in pat:
                nxt = self.goto[state].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[state][ch] = nxt
                state = nxt
            self.out[state].append((pat, payload))
        # BFS failure links
        q: deque[int] = deque()
        for s in self.goto[0].values():
            self.fail[s] = 0
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != s else 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def scan(self, text: str) -> list[tuple[int, str, list[int]]]:
        """Yield (start_offset, surface, payload) for every match with
        word-boundary guards (a toponym inside a longer word is noise)."""
        res = []
        state = 0
        n = len(text)
        for i, ch in enumerate(text):
            while state and ch not in self.goto[state]:
                state = self.fail[state]
            state = self.goto[state].get(ch, 0)
            for pat, payload in self.out[state]:
                start = i - len(pat) + 1
                before_ok = start == 0 or not text[start - 1].isalnum()
                after_ok = i + 1 >= n or not text[i + 1].isalnum()
                if before_ok and after_ok:
                    res.append((start, pat, payload))
        return res
