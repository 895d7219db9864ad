#!/usr/bin/env python3
"""Release-scale PPDB fixture (round 18, VERDICT r17 item 7): a ~GB
multi-file .gz pack in the public PPDB 2.0 line format, so the REF-family
ingestion story (one task per unsplittable member, V2 pushdown skipping
feature tokenization, convert-once amortization) gets measured at release
size instead of KB fixtures. Deterministic (seeded, no clock); synthetic
vocabulary — NOT PPDB data. Verification infrastructure, not engine code.

Usage: python3 tools/gen_ppdb_release.py [/tmp/ppdb_gb] [N_FILES] [LINES_PER_FILE]
"""
import gzip
import os
import random
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ppdb_gb"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
LINES = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

rng = random.Random(42)
WORDS = [
    "happy", "glad", "content", "cheerful", "sad", "unhappy", "pleased",
    "car", "automobile", "vehicle", "dog", "cat", "canine", "road", "street",
    "house", "home", "building", "run", "sprint", "jog", "walk", "stroll",
    "big", "large", "huge", "small", "tiny", "quick", "fast", "rapid",
    "merge", "join", "combine", "sort", "order", "rank", "scan", "read",
]
LHS = ["[JJ]", "[NN]", "[NP]", "[VP]", "[RB]", "[VB]"]
LABELS = ["Equivalence", "ForwardEntailment", "ReverseEntailment",
          "OtherRelated", "Exclusion", "Independent"]


def phrase(r):
    return " ".join(r.choice(WORDS) for _ in range(r.randint(1, 3)))


os.makedirs(OUT, exist_ok=True)
for fi in range(N_FILES):
    r = random.Random(1000 + fi)  # per-file seed: files regenerate independently
    path = os.path.join(OUT, f"ppdb-2.0-synth-part{fi:02d}.txt.gz")
    with open(path, "wb") as raw:
        # mtime=0 => byte-stable across regenerations; level 1 => decompress
        # speed dominates the read path, like real distribution packs
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0, compresslevel=1) as f:
            buf = []
            for i in range(LINES):
                score = round(r.uniform(0.0, 6.0), 2)
                pef = round(r.uniform(0.5, 8.0), 2)
                pfe = round(r.uniform(0.5, 8.0), 2)
                k = r.randint(1, 3)
                align = " ".join(f"{j}-{j}" for j in range(k))
                buf.append(
                    f"{r.choice(LHS)} ||| {phrase(r)} ||| {phrase(r)} ||| "
                    f"PPDB2.0Score={score} p(e|f)={pef} p(f|e)={pfe} ||| "
                    f"{align} ||| {r.choice(LABELS)}\n")
                if len(buf) == 50_000:
                    f.write("".join(buf).encode())
                    buf.clear()
            if buf:
                f.write("".join(buf).encode())
    print(f"[gen-ppdb] {path}", flush=True)
print(f"[gen-ppdb] done -> {OUT} ({N_FILES} files x {LINES} lines)")
