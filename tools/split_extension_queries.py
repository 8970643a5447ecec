#!/usr/bin/env python3
"""One-shot refactoring tool: split ExtensionQueries.scala into per-family
trait files (text/dedup, retrieval/ANN, star/cube/events, curation/sampling)
plus a shared-helpers trait, keeping the object's public surface and the
query registry byte-identical in behavior.

Run from the repo root. Idempotence: refuses to run if the target trait
files already exist.
"""
import re
import sys
from pathlib import Path

SRC = Path("src/main/scala/graft/queries/ExtensionQueries.scala")

FAMILIES = {
    "TextQueries": {
        "doc": ("Text-analysis, document-dedup, and decontamination "
                "queries: stats/lang-ID/quality, exact + n-gram + MinHash "
                "+ SimHash dedup, connected components, span-level "
                "ExactSubstr, eval decontamination, paragraph dedup."),
        "qs": {16, 17, 18, 19, 20, 21, 28, 29, 34, 38, 39, 42, 43, 44, 45,
               46, 53, 55, 57, 58, 90, 103, 108, 109, 114, 115, 118, 121,
               126},
    },
    "RetrievalAnnQueries": {
        "doc": ("Similarity-search, retrieval, and record-matching "
                "queries: brute/LSH/IVF/PQ kNN, BM25 (stored + "
                "incremental), hybrid RRF fusion, fuzzy join, entity "
                "resolution, clustering, BPE."),
        "qs": {22, 23, 59, 85, 86, 89, 91, 92, 94, 95, 96, 97, 98, 99, 100,
               101, 107, 112, 113},
    },
    "StarQueries": {
        "qs": {24, 25, 26, 27, 30, 31, 32, 33, 36, 37, 41, 49, 50, 51, 52,
               54, 60, 61, 62, 63, 64, 66, 67, 68, 69, 70, 71, 72, 73, 74,
               75, 76, 78, 79, 80, 81, 82, 84, 87, 88, 102, 110, 123, 124,
               127},
        "doc": ("Star-schema / cube / warehouse queries: single-table and "
                "star cubes, SCD1/SCD2, as-of + range joins, drill-across, "
                "time intelligence, sketch + histogram cubes, the aggregate "
                "navigator family, events windows/sessions/funnels, "
                "profiler."),
    },
    "CurationQueries": {
        "doc": ("Corpus-curation and sampling queries: splits, mixing "
                "weights, sequence packing, chunking, stratified/diversity "
                "sampling, DSIR, quality classifier + CCNet buckets, "
                "prototype pruning, curriculum shards, and the composed "
                "end-to-end pipelines."),
        "qs": {35, 40, 47, 48, 56, 65, 77, 83, 93, 104, 105, 106, 111, 116,
               117, 119, 120, 122, 125},
    },
}

lines = SRC.read_text().splitlines()

# --- locate structure ------------------------------------------------------
starts = []  # (dash_line_idx, qnum)
for i, l in enumerate(lines):
    m = re.match(r"  // (q\d+) ", l)
    if m:
        assert lines[i - 1].strip().startswith("// ---"), (i, lines[i - 1])
        starts.append((i - 1, int(m.group(1)[1:])))

epi = next(i for i, l in enumerate(lines)
           if l.strip().startswith("/** name -> (query fn"))

imports_end = next(i for i, l in enumerate(lines) if l.startswith("/**"))
imports = lines[:imports_end]                      # package + imports + blank
obj_decl = next(i for i, l in enumerate(lines)
                if l.startswith("object ExtensionQueries {"))
scaladoc = lines[imports_end:obj_decl]
assert scaladoc[-1].strip() == "*/", scaladoc[-1]

helpers_head = lines[obj_decl + 1:starts[0][0]]    # sorted..events defs

# the shared shingle-CTE block lives inside q18's section
b_start = next(i for i, l in enumerate(lines)
               if "Shared DuckDB shingle CTE" in l) - 0
# include the scaladoc opener line itself
assert lines[b_start].strip().startswith("/**"), lines[b_start]
q19_dash = next(s for s, q in starts if q == 19)
shingle_block = lines[b_start:q19_dash]
# q18 family section text excludes the shared block
q18_dash = next(s for s, q in starts if q == 18)

sections = {}
bounds = [s for s, _ in starts] + [epi]
for idx, (st, q) in enumerate(starts):
    en = bounds[idx + 1]
    if q == 18:
        sections[q] = lines[st:b_start]
    else:
        sections[q] = lines[st:en]

assigned = set()
for fam in FAMILIES.values():
    assert not (fam["qs"] & assigned), "overlapping family assignment"
    assigned |= fam["qs"]
assert assigned == set(sections), sorted(set(sections) ^ assigned)

def retag(block):
    """Widen `private` to `private[queries]` on member definitions that
    cross trait boundaries (helpers only)."""
    out = []
    for l in block:
        out.append(re.sub(r"^  private (def|val|lazy val) ",
                          r"  private[queries] \1 ", l))
    return out

def strip_trailing_blank(block):
    while block and not block[-1].strip():
        block = block[:-1]
    return block

IMPORTS = "\n".join(imports).rstrip() + "\n"

# --- helpers trait ----------------------------------------------------------
helpers = IMPORTS + """
/** Shared fixtures, caches, and oracle-SQL building blocks of the
  * [[ExtensionQueries]] families. The query surface is unchanged by the
  * per-family file split — everything still resolves through the single
  * `ExtensionQueries` object; this trait only holds what more than one
  * family needs (`private[queries]`, never wider).
  */
private[queries] trait ExtensionQueryHelpers {

""" + "\n".join(retag(strip_trailing_blank(helpers_head))) + "\n\n" + \
    "\n".join(retag(strip_trailing_blank(shingle_block))) + "\n}\n"

Path("src/main/scala/graft/queries/ExtensionQueryHelpers.scala").write_text(helpers)

# --- family traits ----------------------------------------------------------
for name, fam in FAMILIES.items():
    body = []
    for st, q in starts:               # original file order, stable diffs
        if q in fam["qs"]:
            body.extend(strip_trailing_blank(sections[q]))
            body.append("")
    text = IMPORTS + f"""
/** {fam['doc']}
  * Part of the [[ExtensionQueries]] surface (see its scaladoc for the
  * portability conventions every oracle follows).
  */
private[queries] trait {name} {{ self: ExtensionQueryHelpers =>

""" + "\n".join(body).rstrip() + "\n}\n"
    Path(f"src/main/scala/graft/queries/{name}.scala").write_text(text)

# --- slim object ------------------------------------------------------------
obj = IMPORTS + "\n".join(scaladoc) + """
object ExtensionQueries extends ExtensionQueryHelpers
    with TextQueries with RetrievalAnnQueries with StarQueries
    with CurationQueries {

""" + "\n".join(lines[epi:]) + "\n"
SRC.write_text(obj)
print("split complete:",
      {n: len(f["qs"]) for n, f in FAMILIES.items()})
