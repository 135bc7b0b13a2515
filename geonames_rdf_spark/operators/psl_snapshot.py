"""Pinned public-suffix snapshot (registry/ICANN-style entries).

The live Mozilla Public Suffix List is an external moving target (and
not vendorable from this offline container), so the registered-domain
boundary uses this deterministic pinned snapshot instead: the
multi-level REGISTRY suffixes of the major ccTLD second-level schemes
(`co.uk`-style) plus the systematic third-level families (`k12.<state>
.us`-style), written out from the registries' published schemes.  It is
deliberately data-only — `domains.py` renders the SAME tables into both
a Spark Column expression and a DuckDB scalar, so the engines cannot
drift.

Coverage contract / misattribution bound:

* Entries aim at the REGISTRY (ICANN-section) suffixes.  A small
  false-positive residue is acknowledged (ADVICE r07): ccTLD schemes
  drift between registry and private operation over time (the retired
  `com.ru` family was pruned in r08 for exactly this), and a stale
  entry splits one registrable domain into several publishers — the
  non-conservative direction for the per-domain cap.  The snapshot is
  therefore kept to schemes documented as registry-operated; refreshing
  against a pinned PSL ICANN-section checkout tightens the residue to
  zero without touching the rendering machinery.
* Suffixes absent from the snapshot (newer or exotic ccTLD schemes,
  IDN suffixes, and the PSL's entire PRIVATE section — `blogspot.com`,
  `github.io`, ...) degrade CONSERVATIVELY: hosts under a missing
  suffix collapse to the suffix's own second level, i.e. distinct
  publishers may be treated as ONE domain.  For the two consumers —
  the per-domain cap and the domain-stats report — that direction is
  a stricter cap and a coarser rollup, never a loosened one.  (The
  PSL's private section is arguably the RIGHT call to exclude for
  corpus capping anyway: capping all of blogspot.com as one publisher
  is what RefinedWeb-style host caps intend.)
* Wildcard and exception rules ARE modeled at the TLD level (r08):
  ``WILDCARD_TLD`` carries the PSL's whole-TLD wildcards (`*.ck` — any
  second level is a registry suffix, so the registrable domain is the
  last THREE labels) and ``EXCEPTION2`` the exception names carved
  back out (`!www.ck` — that exact name IS registrable).  Deeper
  wildcards (`*.kawasaki.jp`-style city schemes) remain unmodeled and
  fall back to the two-label default, the conservative direction.

To refresh the snapshot from a real PSL checkout, regenerate these
tuples from the ICANN section's 2- and 3-label rules — the rendering
machinery in ``domains.py`` needs no change.
"""

from __future__ import annotations

# --- two-level registry suffixes, grouped by ccTLD ------------------------

_SECOND_LEVEL: dict[str, tuple[str, ...]] = {
    # Europe
    "uk": ("ac", "co", "gov", "judiciary", "ltd", "me", "net", "nhs",
           "org", "plc", "police", "sch"),
    "at": ("ac", "co", "gv", "or", "priv"),
    "pt": ("com", "edu", "gov", "int", "net", "nome", "org", "publ"),
    "gr": ("com", "edu", "gov", "net", "org"),
    "es": ("com", "edu", "gob", "nom", "org"),
    "it": ("edu", "gov"),
    "fr": ("asso", "com", "gouv", "nom", "prd", "tm"),
    "ro": ("arts", "com", "firm", "info", "nom", "nt", "org", "rec",
           "store", "tm", "www"),
    "pl": ("art", "biz", "com", "edu", "gov", "info", "mil", "net",
           "nom", "org", "waw", "warszawa", "wroc", "krakow", "poznan",
           "gda", "gdansk", "lodz", "slask", "szczecin"),
    "hu": ("co", "info", "org", "priv", "sport", "tm", "2000", "agrar",
           "bolt", "city", "film", "forum", "games", "hotel", "ingatlan",
           "jogasz", "konyvelo", "lakas", "media", "news", "reklam",
           "sex", "shop", "suli", "szex", "tozsde", "utazas", "video"),
    "cy": ("ac", "biz", "com", "ekloges", "gov", "ltd", "mil", "net",
           "org", "press", "pro", "tm"),
    "ie": ("gov",),
    "tr": ("av", "bbs", "bel", "biz", "com", "dr", "edu", "gen", "gov",
           "info", "k12", "kep", "mil", "name", "net", "org", "pol",
           "tel", "tv", "web"),
    "ua": ("com", "edu", "gov", "in", "net", "org", "kiev", "kyiv",
           "kharkiv", "lviv", "odesa", "odessa", "dnipropetrovsk"),
    # .ru pruned in r08 (ADVICE r07): its com/net/org/msk/spb second
    # levels are private-section or retired, i.e. false-positive
    # registry suffixes that would SPLIT one publisher into many
    "by": ("com", "gov", "mil", "of"),
    "rs": ("ac", "co", "edu", "gov", "in", "org"),
    "ba": ("com", "edu", "gov", "mil", "net", "org", "rs", "unbi",
           "unsa"),
    "mk": ("com", "edu", "gov", "inf", "name", "net", "org"),
    "me": ("ac", "co", "edu", "gov", "its", "net", "org", "priv"),
    "al": ("com", "edu", "gov", "mil", "net", "org"),
    "lv": ("asn", "com", "conf", "edu", "gov", "id", "mil", "net",
           "org"),
    "lt": ("gov",),
    "ee": ("aip", "com", "edu", "fie", "gov", "lib", "med", "org",
           "pri", "riik"),
    "is": ("com", "edu", "gov", "int", "net", "org"),
    "mt": ("com", "edu", "gov", "net", "org"),
    # Americas
    "br": ("adm", "adv", "agr", "am", "arq", "art", "ato", "b", "bio",
           "blog", "bmd", "cim", "cng", "cnt", "com", "coop", "eco",
           "ecn", "edu", "emp", "eng", "esp", "etc", "eti", "far",
           "flog", "fm", "fnd", "fot", "fst", "g12", "ggf", "gov",
           "imb", "ind", "inf", "jor", "jus", "leg", "lel", "mat",
           "med", "mil", "mp", "mus", "net", "nom", "not", "ntr",
           "odo", "org", "ppg", "pro", "psc", "psi", "qsl", "radio",
           "rec", "slg", "srv", "taxi", "teo", "tmp", "trd", "tur",
           "tv", "vet", "vlog", "wiki", "zlg"),
    "ar": ("com", "coop", "edu", "gob", "gov", "int", "mil", "musica",
           "net", "org", "tur"),
    "mx": ("com", "edu", "gob", "net", "org"),
    "co": ("com", "edu", "gov", "mil", "net", "nom", "org"),
    "pe": ("com", "edu", "gob", "mil", "net", "nom", "org"),
    "ve": ("arts", "co", "com", "e12", "edu", "firm", "gob", "gov",
           "info", "int", "mil", "net", "org", "rec", "store", "tec",
           "web"),
    "uy": ("com", "edu", "gub", "mil", "net", "org"),
    "ec": ("com", "edu", "fin", "gob", "gov", "info", "k12", "med",
           "mil", "net", "org", "pro"),
    "bo": ("com", "edu", "gob", "gov", "int", "mil", "net", "org",
           "tv"),
    "py": ("com", "coop", "edu", "gov", "mil", "net", "org"),
    "cl": ("aprendemas", "co", "gob", "gov", "mil"),
    "do": ("art", "com", "edu", "gob", "gov", "mil", "net", "org",
           "sld", "web"),
    "gt": ("com", "edu", "gob", "ind", "mil", "net", "org"),
    "sv": ("com", "edu", "gob", "org", "red"),
    "hn": ("com", "edu", "gob", "mil", "net", "org"),
    "ni": ("ac", "biz", "co", "com", "edu", "gob", "in", "info", "int",
           "mil", "net", "nom", "org", "web"),
    "pa": ("abo", "ac", "com", "edu", "gob", "ing", "med", "net",
           "nom", "org", "sld"),
    "pr": ("ac", "biz", "com", "edu", "est", "gov", "info", "isla",
           "name", "net", "org", "pro", "prof"),
    "cu": ("com", "edu", "gov", "inf", "net", "org"),
    "ca": ("ab", "bc", "gc", "mb", "nb", "nf", "nl", "ns", "nt", "nu",
           "on", "pe", "qc", "sk", "yk"),
    # Asia-Pacific
    "jp": ("ac", "ad", "co", "ed", "go", "gr", "lg", "ne", "or"),
    "kr": ("ac", "busan", "chungbuk", "chungnam", "co", "daegu",
           "daejeon", "es", "gangwon", "go", "gwangju", "gyeongbuk",
           "gyeonggi", "gyeongnam", "hs", "incheon", "jeju", "jeonbuk",
           "jeonnam", "kg", "mil", "ms", "ne", "or", "pe", "re", "sc",
           "seoul", "ulsan"),
    "cn": ("ac", "ah", "bj", "com", "cq", "edu", "fj", "gd", "gov",
           "gs", "gx", "gz", "ha", "hb", "he", "hi", "hk", "hl", "hn",
           "jl", "js", "jx", "ln", "mil", "mo", "net", "nm", "nx",
           "org", "qh", "sc", "sd", "sh", "sn", "sx", "tj", "tw",
           "xj", "xz", "yn", "zj"),
    "tw": ("club", "com", "ebiz", "edu", "game", "gov", "idv", "mil",
           "net", "org"),
    "hk": ("com", "edu", "gov", "idv", "net", "org"),
    "sg": ("com", "edu", "gov", "net", "org", "per"),
    "my": ("com", "edu", "gov", "mil", "name", "net", "org"),
    "th": ("ac", "co", "go", "in", "mi", "net", "or"),
    "id": ("ac", "biz", "co", "desa", "go", "mil", "my", "net", "or",
           "ponpes", "sch", "web"),
    "ph": ("com", "edu", "gov", "i", "mil", "net", "ngo", "org"),
    "vn": ("ac", "biz", "com", "edu", "gov", "health", "info", "int",
           "name", "net", "org", "pro"),
    "in": ("ac", "co", "edu", "firm", "gen", "gov", "ind", "mil",
           "net", "nic", "org", "res"),
    "pk": ("biz", "com", "edu", "fam", "gob", "gok", "gon", "gop",
           "gos", "gov", "net", "org", "web"),
    # .bd and .np are whole-TLD wildcards (*.bd / *.np) — see
    # WILDCARD_TLD below; an explicit list here would be redundant
    "lk": ("ac", "assn", "com", "edu", "gov", "grp", "hotel", "int",
           "ltd", "net", "ngo", "org", "sch", "soc", "web"),
    "kz": ("com", "edu", "gov", "mil", "net", "org"),
    "uz": ("co", "com", "net", "org"),
    "au": ("asn", "com", "edu", "gov", "id", "net", "org"),
    "nz": ("ac", "co", "cri", "geek", "gen", "govt", "health", "iwi",
           "kiwi", "maori", "mil", "net", "org", "parliament",
           "school"),
    # Middle East & Africa
    "il": ("ac", "co", "gov", "idf", "k12", "muni", "net", "org"),
    "sa": ("com", "edu", "gov", "med", "net", "org", "pub", "sch"),
    "ae": ("ac", "co", "gov", "mil", "net", "org", "sch"),
    "qa": ("com", "edu", "gov", "mil", "name", "net", "org", "sch"),
    "kw": ("com", "edu", "emb", "gov", "ind", "net", "org"),
    "om": ("co", "com", "edu", "gov", "med", "museum", "net", "org",
           "pro"),
    "bh": ("com", "edu", "gov", "net", "org"),
    "jo": ("com", "edu", "gov", "mil", "name", "net", "org", "sch"),
    "lb": ("com", "edu", "gov", "net", "org"),
    "eg": ("com", "edu", "eun", "gov", "mil", "name", "net", "org",
           "sci"),
    "ma": ("ac", "co", "gov", "net", "org", "press"),
    "tn": ("agrinet", "com", "defense", "edunet", "ens", "fin", "gov",
           "ind", "info", "intl", "mincom", "nat", "net", "org",
           "perso", "rnrt", "rns", "rnu", "tourism"),
    "dz": ("art", "asso", "com", "edu", "gov", "net", "org", "pol"),
    "ng": ("com", "edu", "gov", "i", "mil", "mobi", "name", "net",
           "org", "sch"),
    "ke": ("ac", "co", "go", "info", "me", "mobi", "ne", "or", "sc"),
    "tz": ("ac", "co", "go", "hotel", "info", "me", "mil", "mobi",
           "ne", "or", "sc", "tv"),
    "ug": ("ac", "co", "com", "go", "ne", "or", "org", "sc"),
    "gh": ("com", "edu", "gov", "mil", "org"),
    "zm": ("ac", "biz", "co", "com", "edu", "gov", "info", "mil",
           "net", "org", "sch"),
    "zw": ("ac", "co", "gov", "mil", "org"),
    "za": ("ac", "agric", "alt", "co", "edu", "gov", "grondar", "law",
           "mil", "net", "ngo", "nis", "nom", "org", "school", "tm",
           "web"),
    "et": ("biz", "com", "edu", "gov", "info", "name", "net", "org"),
    "mz": ("ac", "adv", "co", "edu", "gov", "mil", "net", "org"),
    "bw": ("ac", "co", "gov", "net", "org"),
    "na": ("alt", "co", "com", "gov", "net", "org"),
    "mu": ("ac", "co", "com", "gov", "net", "or", "org"),
    # US (state second levels; k12/cc/lib third levels below)
    "us": ("ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl",
           "ga", "gu", "hi", "ia", "id", "il", "in", "ks", "ky", "la",
           "ma", "md", "me", "mi", "mn", "mo", "ms", "mt", "nc", "nd",
           "ne", "nh", "nj", "nm", "nv", "ny", "oh", "ok", "or", "pa",
           "pr", "ri", "sc", "sd", "tn", "tx", "ut", "va", "vi", "vt",
           "wa", "wi", "wv", "wy", "fed", "isa", "nsn", "dni"),
}

#: states whose k12.<state>.us / cc.<state>.us / lib.<state>.us are
#: registry THIRD-level suffixes (the systematic .us locality scheme)
_US_STATES: tuple[str, ...] = (
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "gu", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "pr", "ri", "sc", "sd", "tn",
    "tx", "ut", "va", "vi", "vt", "wa", "wi", "wv", "wy",
)

#: Australian state education/government third levels under edu.au /
#: gov.au (act.edu.au-style, from the auDA scheme)
_AU_STATES: tuple[str, ...] = ("act", "nsw", "nt", "qld", "sa", "tas",
                               "vic", "wa")

#: Whole-TLD wildcard rules from the PSL ICANN section (`*.ck`-style):
#: EVERY second level under these TLDs is a registry suffix, so the
#: registrable domain is the last THREE labels.  (.bd/.np moved here
#: from explicit lists — the wildcard subsumes them.)
WILDCARD_TLD: tuple[str, ...] = (
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
)

#: Exception rules carving a name back OUT of a wildcard (`!www.ck`):
#: the listed name itself is the registrable domain.
EXCEPTION2: tuple[str, ...] = ("www.ck",)

SUFFIX2: tuple[str, ...] = tuple(sorted(
    f"{label}.{cc}"
    for cc, labels in _SECOND_LEVEL.items() for label in labels))

SUFFIX3: tuple[str, ...] = tuple(sorted(
    [f"{kind}.{st}.us" for st in _US_STATES
     for kind in ("k12", "cc", "lib")]
    + [f"{st}.edu.au" for st in _AU_STATES]
    + [f"{st}.gov.au" for st in _AU_STATES]
))
