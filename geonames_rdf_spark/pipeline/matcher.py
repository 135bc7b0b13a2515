"""Multi-pattern matcher backends for the mention scan.

Three interchangeable backends behind ``build_matcher``:

1. ``pyahocorasick`` (C extension) when importable — fastest, any size.
2. ``TrieRegexMatcher`` — the pattern set compiled into a TRIE-STRUCTURED
   regular expression (shared prefixes become nested groups), scanned by
   CPython's C regex engine with a zero-width lookahead so overlapping
   starts are visited.  The engine's greedy nested-optional walk finds the
   LONGEST pattern at each position; shorter patterns at the same start
   are exactly the trie-terminal prefixes of that longest match, recovered
   from a precomputed prefix-chain.  Word-boundary guards are applied in
   Python per *match* (matches are sparse; characters are not).
3. ``AhoCorasick`` (pure Python, pipeline/ahocorasick.py) — the fallback
   for pattern sets too large to compile as a regex.

All backends emit the same match set as the reference automaton:
every (start, pattern) occurrence where the char before ``start`` and the
char after the match are not alphanumeric.  Equivalence is pinned by
tests/test_matcher.py over adversarial nesting/overlap cases.

Scale note (SURVEY §2, DESIGN.md): the matcher is built once on the
driver and broadcast; per-executor memory is the binding constraint at
the 13M-surface gazetteer scale — the regex program is ~10x smaller than
the dict-trie (measured in DESIGN.md), pyahocorasick smaller still.
"""

from __future__ import annotations

import re

from geonames_rdf_spark.pipeline.ahocorasick import AhoCorasick

# above this many patterns, building one giant regex stresses sre's
# compiler; fall back to the pure-Python automaton (or pyahocorasick)
REGEX_MAX_PATTERNS = 200_000


class _TrieNode:
    __slots__ = ("children", "terminal")

    def __init__(self):
        self.children: dict[str, _TrieNode] = {}
        self.terminal = False


def _trie_regex(node: _TrieNode) -> str:
    """Nested-group regex for the subtree; greedy optionals => the engine
    captures the LONGEST terminal on the path first and backtracks to
    shorter terminals only if the longer continuation fails."""
    if not node.children:
        return ""
    parts = [re.escape(ch) + _trie_regex(child)
             for ch, child in sorted(node.children.items())]
    group = parts[0] if len(parts) == 1 and not node.terminal else (
        "(?:" + "|".join(parts) + ")"
    )
    if node.terminal:
        group = "(?:" + "|".join(parts) + ")?"
    return group


class TrieRegexMatcher:
    """Exact Aho-Corasick semantics via one trie-structured regex scan."""

    def __init__(self, patterns: dict[str, list]):
        self._payload = {p: v for p, v in patterns.items() if p}
        root = _TrieNode()
        for pat in self._payload:
            node = root
            for ch in pat:
                node = node.children.setdefault(ch, _TrieNode())
            node.terminal = True
        # every pattern that is a proper prefix of ``pat`` (the only other
        # patterns that can match at the same start position)
        self._prefix_chain: dict[str, list[str]] = {}
        for pat in self._payload:
            node, chain = root, []
            for i, ch in enumerate(pat[:-1]):
                node = node.children[ch]
                if node.terminal:
                    chain.append(pat[: i + 1])
            self._prefix_chain[pat] = chain
        # CONSUMING pattern (not a lookahead): sre's scanner then applies
        # its first-charset skip between attempts — the inter-match gap is
        # scanned at C memchr speed instead of one VM attempt per offset.
        # Overlap is recovered by restarting the search at start+1.
        self._re = re.compile(_trie_regex(root)) if self._payload else None

    def __len__(self) -> int:
        return len(self._payload)

    def scan(self, text: str) -> list[tuple[int, str, list]]:
        """(start, pattern, payload) triples, word-boundary-guarded —
        identical set to ``AhoCorasick.scan`` (order: by start, then
        pattern length ascending)."""
        if self._re is None or not text:
            return []
        res = []
        n = len(text)
        payload = self._payload
        chain = self._prefix_chain
        append = res.append
        search = self._re.search
        pos = 0
        while True:
            m = search(text, pos)
            if m is None:
                return res
            start = m.start()
            pos = start + 1
            if start > 0 and text[start - 1].isalnum():
                continue
            longest = m.group(0)
            for pat in chain[longest]:
                end = start + len(pat)
                if end >= n or not text[end].isalnum():
                    append((start, pat, payload[pat]))
            end = start + len(longest)
            if end >= n or not text[end].isalnum():
                append((start, longest, payload[longest]))


class _PyAhoCorasickMatcher:
    """Wrapper over the pyahocorasick C extension (same scan contract)."""

    def __init__(self, patterns: dict[str, list]):
        import ahocorasick  # noqa: F401 — optional C extension

        self._auto = ahocorasick.Automaton()
        for pat, val in patterns.items():
            if pat:
                self._auto.add_word(pat, (pat, val))
        self._auto.make_automaton()

    def __len__(self) -> int:
        return len(self._auto)

    def scan(self, text: str) -> list[tuple[int, str, list]]:
        if not text:
            return []
        res = []
        n = len(text)
        for end_idx, (pat, val) in self._auto.iter(text):
            start = end_idx - len(pat) + 1
            if start > 0 and text[start - 1].isalnum():
                continue
            if end_idx + 1 < n and text[end_idx + 1].isalnum():
                continue
            res.append((start, pat, val))
        return res


def surface_fingerprint(patterns) -> tuple[int, int]:
    """Cheap content fingerprint of a pattern-KEY set: (count,
    order-independent sum of per-key hashes).  Built-in ``hash`` is
    process-seeded, which is exactly right here — the stale-broadcast
    guards compare a fingerprint computed at ``build_matcher`` time with
    one computed at scan-call time IN THE SAME DRIVER PROCESS.  No sort,
    no md5: ~50 ns/key keeps the per-scan guard sub-second even at the
    13M-surface gazetteer."""
    n, acc = 0, 0
    for k in patterns:
        if k:
            n += 1
            acc = (acc + hash(k)) & 0xFFFFFFFFFFFFFFFF
    return (n, acc)


def scored_fingerprint(scored_map: dict[str, list[tuple]]) -> tuple[int, int]:
    """Fingerprint covering keys AND candidate payloads — two scored maps
    with identical surfaces but different priors must not compare equal
    (the linker would silently score from the stale broadcast)."""
    n, acc = 0, 0
    for k, v in scored_map.items():
        if k:
            n += 1
            acc = (acc + hash((k, tuple(v)))) & 0xFFFFFFFFFFFFFFFF
    return (n, acc)


def build_matcher(patterns: dict[str, list], backend: str = "auto"):
    """Best available matcher: C extension > trie-regex > pure Python.

    Every backend carries ``.fingerprint`` (``surface_fingerprint`` of its
    pattern keys, stamped at build time) so scan-time guards can detect a
    matcher broadcast that no longer matches the caller's surface map.

    An empty (or all-empty-key) pattern set short-circuits to the regex
    backend, whose scan returns [] — pyahocorasick leaves a wordless
    automaton un-constructed and its iter() raises at scan time."""
    m = None
    if not any(patterns):
        m = TrieRegexMatcher({})
    elif backend in ("auto", "c"):
        try:
            m = _PyAhoCorasickMatcher(patterns)
        except ImportError:
            if backend == "c":
                raise
    if m is None:
        if backend in ("auto", "regex") and len(patterns) <= REGEX_MAX_PATTERNS:
            m = TrieRegexMatcher(patterns)
        elif backend == "regex":
            raise ValueError(
                f"{len(patterns)} patterns exceed REGEX_MAX_PATTERNS"
                f" ({REGEX_MAX_PATTERNS}); use backend='python'"
            )
        else:
            m = AhoCorasick(patterns)
    m.fingerprint = surface_fingerprint(patterns)
    return m
