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
]
FIRST_NAMES = [
    "Dr.Alice", "Dr. Alice", "Alice ", "Bob1 Bob2", "A", "Hans-Peter",
    "None", "Maria;Anna", "mr. John", "J", "O t t o", "?", "keine",
    "Jean-Claude", "ANNA", "fritz oder franz", "x y z", "Säugling Karl",
]
PRISONER_NOS = [
    "111", "A 12345", "A-12345", "12.345", "B 4711; 12 345", "Haftnr. 99",
    "None", "12345 A", "A12345", "1;2;3;4;5;6", "12 345", "123.456",
    "Z4711", "r 88", "-", "9;8;7", "00123", "12a34", "A 1", "B-22",
    "nummer unbekannt", "1 234 567",
]
RAW_DATES = [
    "12.3.1943", "1943", "3.12.43", "19430312", "431203", "12/03/1943",
    "12-03-1943", "12 März 1943", "Jan 1944", "1. Januar 1900", "00.00.0000",
    "32.13.1943", "15.25.1943", "25.15.1943", "?", "1943?", "-", "None",
    "23 yrs", "age 30", "12.3.51", "12.3.49", "3.3.3333", "99999999999",
    "1,2,1943", "12;3;1943", "12.Juli 1943", "1850", "1950", "1849", "1951",
    "0.0.1920", "05.05.05", "1943-03-12", "12.oct.1943", "12 dec 1943",
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
