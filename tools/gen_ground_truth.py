#!/usr/bin/env python3
"""Regenerate normalization ground-truth fixtures from the reference code.

Runs the reference implementation (pure pandas) over adversarial input
corpora and dumps its exact outputs as CSVs under
src/test/resources/graftfixtures/. The ScalaTest golden suites compare the
Spark port cell-for-cell against these.

Requires a copy of the reference source whose 3.12-only f-string prints
have been neutralized (see the sed patch in tools notes); tqdm is stubbed.

Usage: python3 tools/gen_ground_truth.py /path/to/patched/reference/src
"""
import sys, types, os

ref_src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refsrc"
tqdm_mod = types.ModuleType("tqdm")
class _T:
    def __init__(self, it=None, **kw): self.it = it
    def __iter__(self): return iter(self.it)
    @staticmethod
    def pandas(**kw): pass
tqdm_mod.tqdm = _T
sys.modules["tqdm"] = tqdm_mod
sys.path.insert(0, ref_src)

import pandas as pd
from aroa_etl.enc.processing import process_unpacked_data
from aroa_etl.attribute_processing.column_processing import (
    normalize_last_name, normalize_first_name, normalise_prisoner_number,
    normalise_date)

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graftfixtures")

LAST_NAMES = [
    "Muller", "Dr. Müller", "van der Berg", "Müller geb. Schmidt",
    "Weiss-Meyer", "B l o c k e d", "Novakova", "None", "blank", "unknown",
    "O'Brien", "de la Cruz", "MÜLLER", "schmidt; meyer", "a,b,c,d,e,f,g",
    "Frau Schulze", "Meier (Mayer)", "Schmidt ?", "123", "Kowalska",
    "Petersohn", "gestrichen", "Mc Donald", "unklar", "N.N.", "-",
    "Huber und Wolf", "  spaced  ", "Prof. Dr. Lang", "D'Angelo",
    "von. Trapp", "name mit    vielen   spaces", "Ova", "Müller Ene",
    # r19 additions: unicode folds beyond umlauts, stacked birth-name
    # markers, cased noble prefixes, edge punctuation, hyphen chains,
    # more female endings, embedded digits, quote shapes
    "Łukasz", "Şahin", "Đorđević", "Ñoño", "Müller geb. Schmidt geb. Weber",
    "Van Der Meer", "VON TRAPP", "v. Berg", "Müller,", ";Schmidt",
    "(Klammer)", "a-b-c-d-e", "Horváthová", "Kovačová", "Petrova",
    "Schmidt2", "M3yer", "O''Hara", "K.", "zuletzt Meier",
    # r19 unicode-whitespace probes: python \s and str.strip are
    # unicode-aware (NBSP is whitespace), Java's are ASCII-only - these
    # pin whichever behavior the reference actually exhibits
    "M\u00fcller\u00a0Meier", "\u00a0Edged\u00a0", "\tTabEdged\t",
    # r19 astral/titlecase probes: python title() walks codepoints and
    # uses the TITLECASE mapping (digraphs)
    "na\U0001D58De", "\U0001D578\u00fcller", "\u01C6ungla",
]
FIRST_NAMES = [
    "Dr.Alice", "Dr. Alice", "Alice ", "Bob1 Bob2", "A", "Hans-Peter",
    "None", "Maria;Anna", "mr. John", "J", "O t t o", "?", "keine",
    "Jean-Claude", "ANNA", "fritz oder franz", "x y z", "Säugling Karl",
    # r19 additions: spaced hyphens, stacked titles, accented Latin,
    # ordinal suffixes, more keyword shapes
    "Hans - Peter", "ANNA-MARIA", "Dr. Dr. h.c. Karl", "Frl. Eva",
    "José", "François", "Karl II", "unleserlich", "E.", "Ing. Petr",
    # r19 unicode-whitespace probes (the last-name NBSP find, mirrored)
    "Anna\u00a0Maria", "\u00a0Eva\u00a0",
]
PRISONER_NOS = [
    "111", "A 12345", "A-12345", "12.345", "B 4711; 12 345", "Haftnr. 99",
    "None", "12345 A", "A12345", "1;2;3;4;5;6", "12 345", "123.456",
    "Z4711", "r 88", "-", "9;8;7", "00123", "12a34", "A 1", "B-22",
    "nummer unbekannt", "1 234 567",
    # r19 additions: trailing letter, slashed/sectioned numbers,
    # zero-shapes, mixed separators, bare markers
    "A12345B", "12-345-67", "Nr. 12345", "12345/6", "000", "0",
    " 123 ", "ABC", "12.34.56", "123?;456", "B", "A.12345",
    # r19 unicode-whitespace probes
    "A\u00a012345", "\u00a0777\u00a0",
]
RAW_DATES = [
    "12.3.1943", "1943", "3.12.43", "19430312", "431203", "12/03/1943",
    "12-03-1943", "12 März 1943", "Jan 1944", "1. Januar 1900", "00.00.0000",
    "32.13.1943", "15.25.1943", "25.15.1943", "?", "1943?", "-", "None",
    "23 yrs", "age 30", "12.3.51", "12.3.49", "3.3.3333", "99999999999",
    "1,2,1943", "12;3;1943", "12.Juli 1943", "1850", "1950", "1849", "1951",
    "0.0.1920", "05.05.05", "1943-03-12", "12.oct.1943", "12 dec 1943",
    # q52's exact style strings (the at-scale branch-matrix oracle):
    # question-mark fold into a 6-digit run, transposed MM.dd both sides
    # of the swap guard, bare 20xx years, sub-50 2-digit year, German age
    "??.04.1995", "04.19.1995", "04.07.1995", "2000", "2001", "01/02/01",
    "34 Jahre", "15.08.2001",
    # r19 additions: leap-day both ways (1900 is NOT a leap year),
    # invalid day-month combos, timespan boundary years both sides,
    # roman-numeral and dotted-abbrev months, 6-digit year edges,
    # approximate-date markers, degenerate repeats
    "29.02.1944", "29.02.1943", "29.02.1900", "31.04.1943", "31.11.1943",
    "31.12.1850", "01.01.1950", "31.12.1849", "01.01.1951",
    "12.III.1943", "1.Jan.1944", "12. Dez. 1943", "ca. 1943", "etwa 1940",
    "450312", "120350", "12.3.50", "12.3.00", "1943.03.12", "1943/03/12",
    "13.13.13", "1.1.1", "00.05.1943", "05.00.1943",
    # r19 unicode-whitespace probes
    "12.3.1943\u00a0", "\u00a01943", "12\u00a0März\u00a01943",
]

def dump(df, name):
    path = os.path.join(OUT, name)
    df.to_csv(path)
    print(f"wrote {path} ({df.shape[0]} rows, {df.shape[1]} cols)")

ln = pd.DataFrame({"last_name": LAST_NAMES})
dump(pd.concat([ln, normalize_last_name(ln, "last_name", "src")], axis=1),
     "last_names_ground_truth.csv")

fn = pd.DataFrame({"first_name": FIRST_NAMES})
dump(pd.concat([fn, normalize_first_name(fn, "first_name", "src")], axis=1),
     "first_names_ground_truth.csv")

pn = pd.DataFrame({"prisoner_number": PRISONER_NOS})
dump(pd.concat([pn, normalise_prisoner_number(pn, "prisoner_number", "src")], axis=1),
     "prisoner_ground_truth.csv")

dd = pd.DataFrame({"raw_date": [str(x) for x in RAW_DATES]})
dump(pd.concat([dd, normalise_date(dd, "raw_date", "date", "src", [1850, 1950])], axis=1),
     "dates_ground_truth.csv")

# naming-mode variants of the last/first-name processors
VARIANT_NAMES = ["Muller geb. Schmidt", "van Berg; Meyer", "Dr. Weiss", "None", "Ova"]
vn = pd.DataFrame({"last_name": VARIANT_NAMES})
dump(pd.concat([vn, normalize_last_name(vn, "last_name", "src",
                                        alternative_spelling=True)], axis=1),
     "last_names_alt_ground_truth.csv")
dump(pd.concat([vn, normalize_last_name(vn, "last_name", "src", alias=True)], axis=1),
     "last_names_alias_ground_truth.csv")
dump(pd.concat([vn, normalize_last_name(vn, "last_name", "src",
                                        birth_name_input=True)], axis=1),
     "last_names_birth_ground_truth.csv")
vf = pd.DataFrame({"first_name": VARIANT_NAMES})
dump(pd.concat([vf, normalize_first_name(vf, "first_name", "src", alias=True)], axis=1),
     "first_names_alias_ground_truth.csv")

# clean_date (D2) three-column triples, both dropdown modes
from aroa_etl.attribute_processing.column_processing import clean_date
TRIPLES = [
    ("3", "Jan", "43"), ("-", "5", "1943"), ("31", "13", ""),
    ("09", "04", "1900"), ("00", "00", "0000"), ("1", "unclear", "1920"),
    ("20", "8", "1944"), ("5", "Mai", "49"), ("", "", ""), ("12", "3.0", "1935.0"),
    # r19 additions: leap days (1944 yes, 1900 no), invalid day-month,
    # German month names and dotted abbreviations, all-sentinel,
    # boundary years
    ("29", "02", "1944"), ("29", "02", "1900"), ("31", "11", "1943"),
    ("15", "März", "1943"), ("1", "Jan.", "44"), ("-", "-", "-"),
    ("31", "12", "1850"), ("01", "01", "1950"), ("3", "3", "3"),
    ("12", "00", "1943"),
]
td = pd.DataFrame({"d": [t[0] for t in TRIPLES], "m": [t[1] for t in TRIPLES],
                   "y": [t[2] for t in TRIPLES]})
for dropdown in (False, True):
    out = clean_date(td.copy(), ["d", "m", "y"], "tdate", "src",
                     timespan=[1850, 1950], dropdown=dropdown)
    tag = "dd" if dropdown else "raw"
    dump(pd.concat([td, out], axis=1), f"clean_date_{tag}_ground_truth.csv")

# full-pipeline ground truth over the reference fixture
unpacked = pd.read_csv("/root/reference/testing_data/unpacked_enc_data.csv",
                       index_col=0, dtype=str)
out = process_unpacked_data(unpacked, skip_columns=[
    "updated_at", "user_id", "workflow_id", "created_at", "document_id", "id"])
dump(out, "processed_ground_truth.csv")

# ENC_Deduplicater golden (q17's oracle): the reference's exact dedup
# output over its own normalised fixture, same job spec as
# tests/enc/deduplication_test.py. object_id is a fresh uuid4 per run →
# dropped (q17 drops it too).
#
# matching.py imports fuzzy/plot deps at module level, but the four
# DEFAULT matchers q17 exercises never call them (no with_fuzzy_matching
# in any default preset; plotting is display-only) — stub the modules,
# with loud failures if a stubbed callable is ever actually invoked.
def _unused(name):
    def f(*a, **k):
        raise AssertionError(f"{name} was called — the dedup golden would not be faithful")
    return f

def _jaro(s1, s2):
    # standard Jaro similarity (the public algorithm jellyfish implements):
    # matches within floor(max/2)-1, transpositions = mismatched-alignment
    # pairs / 2. Self-checked below against the textbook MARTHA/MARHTA
    # vector and the repo's pinned Scala E7 vectors.
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    window = max(len(s1), len(s2)) // 2 - 1
    m1, m2 = [], []
    used = [False] * len(s2)
    for i, c in enumerate(s1):
        for j in range(max(0, i - window), min(len(s2), i + window + 1)):
            if not used[j] and s2[j] == c:
                used[j] = True
                m1.append(c)
                m2.append(j)
                break
    if not m1:
        return 0.0
    m2 = [s2[j] for j in sorted(m2)]
    t = sum(a != b for a, b in zip(m1, m2)) / 2
    m = len(m1)
    return (m / len(s1) + m / len(s2) + (m - t) / m) / 3

assert abs(_jaro("MARTHA", "MARHTA") - (1 + 1 + (6 - 1) / 6) / 3) < 1e-12
assert abs(_jaro("abcdef", "bcadef") - (1 + 1 + (6 - 1.5) / 6) / 3) < 1e-12
assert _jaro("", "") == 1.0 and _jaro("a", "") == 0.0 and _jaro("same", "same") == 1.0
assert abs(_jaro("DWAYNE", "DUANE") - 0.82) < 0.005  # textbook vector
for mod, attrs in [
        ("iteration_utilities", {"first": lambda it: next(iter(it))}),
        ("jellyfish", {"jaro_similarity": _jaro}),
        ("plotly", {}), ("plotly.express", {}), ("plotly.graph_objects", {}),
        ("rapidfuzz", {"fuzz": types.SimpleNamespace(ratio=_unused("fuzz.ratio")),
                       "utils": types.SimpleNamespace(default_process=_unused("utils.default_process"))})]:
    m = types.ModuleType(mod)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(mod, m)
from aroa_etl.enc.deduplication import ENC_Deduplicater
normalised = pd.read_csv("/root/reference/testing_data/normalised_enc_data.csv",
                         index_col=0, dtype=str)
dd = ENC_Deduplicater(normalised, "document_id",
                      metadata_columns=["object_id", "workflow_id"])
dd.on_person_cols(["first_name_cleaned_0", "first_name_cleaned_1",
                   "last_name_cleaned_0"])
dd.on_date_cols(["birthdate_day_cleaned", "birthdate_month_cleaned",
                 "birthdate_year_cleaned", "imprisonment_day_cleaned",
                 "imprisonment_month_cleaned", "imprisonment_year_cleaned"])
dd.on_other_cols(["imprisonment_camp_cleaned", "place_of_birth_0_cleaned",
                  "place_of_birth_1_cleaned"])
dd.on_other_strict_cols([f"prisoner_category_{i}_cleaned" for i in range(6)])
dedup_out = dd.run().drop(columns=["object_id"])
# -> MAIN resources: q17's DuckDB oracle reads this via Fixtures.path,
# and Verify runs from the main classpath
dedup_out.to_csv(os.path.join(OUT, "..", "..", "..", "main", "resources",
                              "graftfixtures", "dedup_ground_truth.csv"))
print(f"wrote main-resources dedup_ground_truth.csv ({dedup_out.shape[0]} rows, {dedup_out.shape[1]} cols)")
