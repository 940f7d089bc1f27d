#!/usr/bin/env python3
"""Differential fuzz of the text-kernel queries over a HOSTILE corpus.

The three real tokenizer bugs of rounds 17-19 (simhash zero-signature,
tab-only trim guard, leading-edge phantom token) were all CORPUS-BLIND:
the driver's ASCII corpus exercised neither side of the asymmetry, so
the oracle gate stayed green while the kernel and its SQL replay
disagreed on text shapes the corpus never contained. This harness
closes that class proactively: it swaps the `documents` table for a
corpus built from the text shapes most likely to split the JVM and
DuckDB and runs the regular check.py gate (Spark kernel vs DuckDB
oracle SQL, rows+schema+hash) over the text-family queries.

On first run (r19) it caught three REAL oracle-replay gaps, all fixed:
  - RE2's \s lacks \x0b (VT), Java's includes it -> a VT-only document
    was a token to the oracle, whitespace to the kernel (q26-q29);
  - DuckDB trim() is unicode-aware (strips NBSP/U+3000), Java
    String.trim strips only <= U+0020 -> q29's fingerprint norm
    diverged on NBSP-only text;
  - q28's oracle digit_ratio lacked the kernel's empty-text guard
    (DuckDB 0.0/0 = NaN, kernel 0.0).
The oracle SQL now spells out Java's \s as [ \t\n\x0b\f\r] and replays
Java trim as a [\x00-\x20] edge strip.

KNOWN, DOCUMENTED engine divergences (shapes in DIVERGENT below, NOT
in the default corpus; these are properties of the two engines'
Unicode tables, not kernel bugs, and the driver corpus is ASCII):
  - context-sensitive case folding: Java toLowerCase maps word-final
    capital sigma to U+03C2 and U+0130 to "i"+U+0307; DuckDB's
    utf8proc folds context-free -> q29 fingerprint differs on Greek /
    Turkish-dotted-I text.
  (Two former divergence classes were CLOSED in r19 by upgrading the
  oracle replay: the script-ID branches are replayed in full, so
  CJK/Hangul/Cyrillic/halfwidth shapes live in the DEFAULT corpus, and
  the fingerprint replay expands astral codepoints into UTF-16
  surrogate pairs, so emoji/astral shapes do too.)

q25 (MinHash-LSH) is excluded by default: its oracle is the EXACT
Jaccard pair set and the pipeline reports the LSH-surfaced subset --
equal only when every true pair's Jaccard is LSH-friendly (the driver
corpus is; q25's own Scaladoc documents the contract). The hostile
echo pairs sit at J = 0.5 where 16-band/4-row recall is ~64%, so a
miss is the probabilistic design, not an asymmetry (q27 checks the
same shingle construction exactly, and q25 runs green on the regular
corpus gate).

Usage:
  python3 tools/hostile_diff.py                -> must-agree corpus, ALL GREEN expected
  python3 tools/hostile_diff.py --divergent    -> adds divergent shapes, drops q29
  python3 tools/hostile_diff.py q27 q28        -> query subset
"""
import os, shutil, subprocess, sys

BASE = "/root/testdata/sf0.001"
DIR = "/tmp/hostile_sf"

# Shapes BOTH engines must agree on byte-for-byte. doc_ids stay < 2500
# so corpusWithDups (q26/q27: doc_id < 2500, %5 and %7 echo copies)
# sees all of them.
TEXTS = [
    # --- whitespace shapes (the r17-r19 bug class) ---------------------
    "",                                  # empty
    " ",                                 # one space
    "   ",                               # spaces only
    "\t",                                # tab only
    "\t\t\n",                            # tab+newline only
    "\r\n",                              # CRLF only
    "\x0b\x0c",                          # VT+FF: Java \s has \x0b, RE2 \s does NOT (the r19 find)
    "\x0bword\x0b",                      # VT-wrapped token
    "\thello",                           # leading tab (the r19 fix)
    "hello\t",                           # trailing tab (the r18 fix)
    "\r\nhello world\r\n",               # CRLF-wrapped
    "a  b\t\tc\n\nd",                    # interior multi-whitespace runs
    " \t mixed \n edges \t ",            # everything at once
    # --- information separators + NEL (r20): python treats U+001C-001F
    # and U+0085 as whitespace, but the TEXT family is Java-\s-defined
    # (not a python replay) and the oracle spells Java's \s out - both
    # engines must treat them as TOKEN CHARS here. (The python-parity
    # normalization kernels handle them as whitespace via Regexes.PyS,
    # adjudicated by the reference golden fixtures, not this harness.)
    "\x1c\x1d\x1e\x1f",                  # separators only
    "a\x1cb c",                          # separator inside a token
    "\x85nel\x85",                       # NEL-wrapped token
    # --- non-\s unicode "whitespace" (must be TOKEN CHARS in both) -----
    " ",                            # NBSP alone (Java trim keeps it; oracle now replays that)
    "a b",                          # NBSP joins a single token in both engines
    "​zero​width",             # ZWSP is not \s in Java or RE2
    "　ideographic　space",      # U+3000 is not \s in either (ASCII-only \s)
    " line para",              # LS/PS separators: token chars in both
    # --- case folding shapes both engines fold identically -------------
    "STRASSE straße ß",                  # sharp s folds to itself in both
    "ǅungla ǈubav ǋegoš",                # titlecase digraphs: both fold to U+01C6/01C9/01CC
    "MIXED Case tExT",                   # plain ASCII folding
    # --- combining marks / normalization (NO normalization expected) ---
    "café café",                   # NFD vs NFC spellings must stay distinct
    "á̂̃ stacked",       # stacked combining marks (BMP)
    # --- astral (fingerprint replays surrogate pairs since r19) ---------
    "😀😀 😀",                            # emoji: hashes as UTF-16 surrogate pairs on both sides
    "👨‍👩‍👧 family",          # ZWJ sequence
    "𝕳𝖊𝖑𝖑𝖔 𝖂𝖔𝖗𝖑𝖉",                      # math alphanumerics: zero letters in BOTH engines' letter loop
    # --- scripts (BMP, no case, no astral) -------------------------------
    "मानक हिन्दी",                        # Devanagari (no case to fold)
    "مرحبا بالعالم",                     # RTL Arabic
    "נקודה עברית",                       # RTL Hebrew
    # script-ID branches (q29's oracle replays them in full since r19)
    "日本語のテキストです",                # kana+kanji -> ja
    "한국어 텍스트 입니다",                 # Hangul -> ko
    "中文文本没有假名",                    # ideographs only -> zh
    "Привет мир привет",                 # Cyrillic -> ru
    "ﾊﾝｶｸｶﾀｶﾅ ﾃｽﾄ",                      # halfwidth katakana (U+FF66-FF9D) -> ja
    "ㄱㄴㄷㄹ ㅏㅑㅓ",                     # compatibility jamo -> ko
    "㐀㐁㐂㐃㐄㐅",                        # CJK Extension A -> zh
    "ＡＢＣ ｄｅｆ",                       # fullwidth Latin: same block as halfwidth kana, must stay Latin
    "テスト test test test tests",        # kana ratio just over the 0.1 threshold
    "的 latin words dominate here ok",    # ideo ratio under 0.3 -> falls to profiles
    # --- punctuation / digits -------------------------------------------
    "!!! ??? ... ---",                   # ASCII punct only
    "„quoted“ «guillemets» – dash…",     # unicode punct (not \p{Punct}/[:punct:] in either)
    "123 456.789 1e10 0x1F",             # digits and pseudo-numbers
    "'s 't 're 've 'm 'll 'd",           # the BPE contraction suffixes verbatim
    # --- adversarial repeats ---------------------------------------------
    "the the the the the the",           # stopwords only
    "x " * 300,                          # long repeat (trailing space!)
    "a",                                 # single char
    "ab" * 2000,                         # one long token
]

# Documented engine-divergence shapes (see module docstring). Added
# only under --divergent, which drops q29 (the one query whose value
# dump exposes the folding/astral/script divergences directly).
DIVERGENT = [
    "ΑΒΓΔΟΣ",                            # word-final sigma: contextual in Java only
    "ΣΙΣΥΦΟΣ ΟΔΥΣΣΕΥΣ",                  # two words ending in sigma
    "İstanbul ısız I i",                 # dotted/dotless I
]

DEFAULT_QUERIES = ["q24", "q26", "q27", "q28", "q29", "q50", "q32", "q36", "q33"]

# Hostile event rows: (event_id, ts literal or None, user_id, event_type).
# Targets the window/session boundary semantics the generated corpus
# (microsecond-random timestamps) can never exercise: exact hour
# boundaries, exact 30-minute session gaps, duplicate instants, null
# timestamps (defined: dropped, both engines), pre-1970 and far-future
# instants.
EVENTS = [
    (0, "2024-01-01 00:00:00",        1, "a"),   # exact hour boundary
    (1, "2024-01-01 00:59:59.999999", 1, "a"),   # last micro of the hour
    (2, "2024-01-01 01:00:00",        1, "a"),   # first micro of the next
    (3, "2024-01-01 01:00:00",        1, "b"),   # duplicate instant, other type
    (4, None,                          1, "a"),   # null ts: dropped
    # user 2: EXACT 30-minute gaps — the session boundary. VERIFIED
    # (Spark 4.1.2): an event at exactly last+gap MERGES into the
    # session (the boundary is inclusive), matching the q36 oracle's
    # strict '> 30 minutes' break; only a gap strictly past 30 minutes
    # starts a new session (event 7).
    (5, "2024-01-01 00:00:00",        2, "a"),
    (6, "2024-01-01 00:30:00",        2, "a"),   # exactly at the gap edge: merges
    (7, "2024-01-01 01:00:00.000001", 2, "a"),   # strictly past the edge: new session
    # user 3: sub-gap chain stays ONE session across an hour boundary
    (8, "2024-01-01 00:45:00",        3, "a"),
    (9, "2024-01-01 01:14:59.999999", 3, "a"),
    (10, "2024-01-01 01:44:59",       3, "a"),
    # extremes: pre-1970 (negative epoch) and far future
    (11, "1944-03-12 08:30:00",       4, "a"),
    (12, "2222-12-31 23:30:00",       4, "a"),
    (13, "1969-12-31 23:59:59.5",     4, "a"),   # just below epoch 0
    (14, "1970-01-01 00:00:00",       4, "a"),   # epoch 0 exactly
]


def build_corpus(texts):
    if os.path.isdir(DIR):
        shutil.rmtree(DIR)
    os.makedirs(DIR)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings"]:
        os.symlink(f"{BASE}/{t}.parquet", f"{DIR}/{t}.parquet")
    import duckdb
    con = duckdb.connect()
    # hostile events table (micros TIMESTAMP generation — Tables.events
    # handles it alongside the corpus's TIMESTAMP(NANOS))
    con.execute("""CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP,
                                    user_id BIGINT, event_type VARCHAR)""")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", EVENTS)
    con.execute(f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                     1.0 AS value, '{{}}' AS props
              FROM ev ORDER BY event_id)
        TO '{DIR}/events.parquet' (FORMAT parquet)""")
    # Two copies of every shape (ids i and i+1000) so the dedup queries
    # have a true duplicate pair for EVERY hostile shape, plus a
    # NULL-text row. 1000 > len(texts) keeps the id spaces disjoint and
    # everything < 2500.
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(i + 1000, t) for i, t in enumerate(texts)]
    rows.append((2400, None))
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    con.execute(f"""
        COPY (SELECT doc_id, text,
                     'xx' AS lang,
                     'hostile' AS source,
                     length(text) AS n_chars
              FROM docs ORDER BY doc_id)
        TO '{DIR}/documents.parquet' (FORMAT parquet)""")
    return len(rows)


def q25_recall_report():
    """q25 is excluded from the pass/fail gate (LSH recall at J=0.5 is
    probabilistic by design), but its recall on this corpus is still
    worth MEASURING: run the pipeline once and report surfaced/true
    pairs per Jaccard bucket. Identical-document pairs (J=1.0) must
    always be surfaced — identical shingle sets give identical
    signatures — so a miss there IS a bug and exits nonzero.
    """
    import json, subprocess as sp
    r = sp.run(["python3", "tools/check.py", DIR, "q25"],
               capture_output=True, text=True, cwd="/root/repo")
    if r.returncode not in (0, 1):  # 1 = expected hash FAIL (LSH subset)
        print(r.stdout[-2000:]); print(r.stderr[-2000:])
        print("FAIL q25 recall: check.py crashed (see output above)")
        return 1
    if "no spark result" in r.stdout or "crashed in Verify" in r.stdout \
            or "oracle error" in r.stdout:
        print(r.stdout[-2000:])
        print("FAIL q25 recall: Verify or oracle failed (see output above)")
        return 1
    import duckdb, pandas as pd
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DIR}/documents.parquet')")
    oracle = json.load(open("/tmp/graft_verify/oracle_sql.json"))["q25_minhash_dedup"]
    exp = con.execute(oracle).df()
    got = pd.read_parquet("/tmp/graft_verify/q25_minhash_dedup")
    es = {(a, b): j for a, b, j in exp[["a", "b", "jaccard"]].values.tolist()}
    gs = set(map(tuple, got[["a", "b"]].values.tolist()))
    exact = [p for p, j in es.items() if j >= 0.999999]
    border = [p for p, j in es.items() if j < 0.999999]
    missed_exact = [p for p in exact if p not in gs]
    hit_border = [p for p in border if p in gs]
    print(f"q25 LSH recall: exact-dup pairs {len(exact) - len(missed_exact)}/{len(exact)}"
          f" (must be total), borderline (0.5<=J<1) {len(hit_border)}/{len(border)}"
          f" (probabilistic: ~64% per pair at J=0.5 with 16 bands x 4 rows)")
    if missed_exact:
        print(f"FAIL q25: missed EXACT duplicate pairs {sorted(missed_exact)[:10]}")
        return 1
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    divergent = "--divergent" in sys.argv
    texts = TEXTS + (DIVERGENT if divergent else [])
    queries = args or [q for q in DEFAULT_QUERIES if not (divergent and q == "q29")]
    n = build_corpus(texts)
    print(f"hostile corpus: {n} rows ({'with' if divergent else 'without'} "
          f"divergent shapes) -> {DIR}/documents.parquet")
    rc = subprocess.call(["python3", "tools/check.py", DIR] + queries, cwd="/root/repo")
    if not args:  # default runs also measure q25's LSH recall
        rc = max(rc, q25_recall_report())
    sys.exit(rc)
