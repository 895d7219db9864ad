#!/usr/bin/env python3
"""Deterministic PPDB 2.0-format sample fixture (FIXTURES.md SS2).

Public line format (Ganitkevitch et al. NAACL 2013; Pavlick et al. ACL 2015):
  LHS ||| phrase ||| paraphrase ||| key=value ... ||| i-j i-j ... ||| EntailmentLabel
Run once; commit both this script and the resulting .gz.
"""
import gzip
import pathlib

LINES = """\
[JJ] ||| happy ||| glad ||| PPDB2.0Score=5.31 p(e|f)=1.20 p(f|e)=1.85 ||| 0-0 ||| Equivalence
[JJ] ||| happy ||| content ||| PPDB2.0Score=4.12 p(e|f)=2.04 p(f|e)=2.33 ||| 0-0 ||| Equivalence
[JJ] ||| happy ||| cheerful ||| PPDB2.0Score=3.95 p(e|f)=2.51 p(f|e)=2.60 ||| 0-0 ||| ForwardEntailment
[JJ] ||| glad ||| pleased ||| PPDB2.0Score=4.77 p(e|f)=1.43 p(f|e)=1.51 ||| 0-0 ||| Equivalence
[JJ] ||| sad ||| unhappy ||| PPDB2.0Score=4.50 p(e|f)=1.61 p(f|e)=1.70 ||| 0-0 ||| Equivalence
[JJ] ||| sad ||| happy ||| PPDB2.0Score=0.42 p(e|f)=6.90 p(f|e)=7.10 ||| 0-0 ||| Exclusion
[NP] ||| the car ||| the automobile ||| PPDB2.0Score=4.88 p(e|f)=0.80 p(f|e)=0.95 ||| 0-0 1-1 ||| Equivalence
[NP] ||| the automobile ||| the vehicle ||| PPDB2.0Score=4.02 p(e|f)=1.10 p(f|e)=1.25 ||| 0-0 1-1 ||| ForwardEntailment
[VP] ||| thrown into jail ||| imprisoned ||| PPDB2.0Score=3.41 p(e|f)=2.95 p(f|e)=3.10 ||| 0-0 1-0 2-0 ||| Equivalence
[VP] ||| thrown into jail ||| jailed ||| PPDB2.0Score=3.87 p(e|f)=2.10 p(f|e)=2.25 ||| 0-0 1-0 2-0 ||| Equivalence
[NN] ||| dog ||| cat ||| PPDB2.0Score=0.95 p(e|f)=5.20 p(f|e)=5.05 ||| 0-0 ||| OtherRelated
[NN] ||| dog ||| canine ||| PPDB2.0Score=4.66 p(e|f)=1.33 p(f|e)=1.40 ||| 0-0 ||| Equivalence
"""

p = pathlib.Path(__file__).resolve().parent / "ppdb_sample.txt.gz"
# mtime=0 for a byte-stable artifact across regenerations
with open(p, "wb") as raw:
    with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
        f.write(LINES.encode("utf-8"))
print(f"wrote {p}")

# Multi-file pack: the SAME 12 rules split across 4 .gz parts — the shape a
# real PPDB release ships in. gzip is non-splittable, so parallelism on the
# raw release equals the file count; ppdb_parse_multi + its spec prove the
# glob scan schedules one task per part.
multi = pathlib.Path(__file__).resolve().parent / "ppdb_multi"
multi.mkdir(exist_ok=True)
lines = LINES.splitlines(keepends=True)
for i in range(4):
    part = multi / f"part-{i:05d}.txt.gz"
    with open(part, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write("".join(lines[i * 3:(i + 1) * 3]).encode("utf-8"))
    print(f"wrote {part}")

# Release-size ladder (round 11): real PPDB ships S -> XXXL packs where each
# larger pack is a SUPERSET of the smaller one, extended with lower-scoring
# rules (the packs are score-pruned prefixes of one ranked rule list). The
# fixture mirrors that: rules sorted by PPDB2.0Score descending, pack k =
# the top 3*k rules. Parsing the ladder exercises the multi-file glob +
# per-file lineage (_metadata.file_name / read_csv filename=true).
import re
def score(line):
    return float(re.search(r"PPDB2\.0Score=([0-9.]+)", line).group(1))
ranked = sorted(LINES.splitlines(keepends=True), key=score, reverse=True)
release = pathlib.Path(__file__).resolve().parent / "ppdb_release"
release.mkdir(exist_ok=True)
for name, k in [("s", 3), ("m", 6), ("l", 9), ("xl", 12)]:
    part = release / f"ppdb-2.0-{name}.txt.gz"
    with open(part, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write("".join(ranked[:k]).encode("utf-8"))
    print(f"wrote {part}")
