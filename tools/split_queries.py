"""One-shot mechanical splitter: queries.py -> registry/ family modules.

Preserves registration order exactly (modules imported in chunk order,
each appending to the SAME _REGISTRY list defined in registry/core.py)
and every public/private symbol of the old module (the queries.py
façade re-exports every module's namespace, so existing
`from yelp_data_pipeline_spark.queries import q_foo / _helper` imports
keep working). Verified afterwards by fingerprint compare + the full
gate stack. Run from /root/repo; idempotence NOT intended — run once.
"""

from __future__ import annotations

import ast
import os
import re
from collections import defaultdict

SRC = "yelp_data_pipeline_spark/queries.py"
PKG = "yelp_data_pipeline_spark/registry"

# chunk index -> module name (None = merged into the next named one or
# handled specially). Computed against the 25-chunk layout reported by
# tools/split_analysis.py.
PLAN = [
    (0, "core"), (1, "core"),
    (2, "dashboard"), (3, "dims"), (4, "facts"), (5, "setops"),
    (6, "semijoins"), (7, "filters"), (8, "windows"), (9, "aggregates"),
    (10, "merge"), (11, "dedup"), (12, "similarity"), (13, "textops"),
    (14, "curation"), (15, "multimodal"), (16, "streaming"),
    (17, "behavior"), (18, "quality"), (19, "warehouse_a"),
    (20, "warehouse_b"), (21, "stats_evals"), (22, "stats_evals"),
    (23, "graph_ml"),
    (24, "__facade__"),
]

DOCS = {
    "core": "Registry core: QuerySpec, the shared _REGISTRY list, the "
    "@_q decorator, _t table loader, and the shared Spark/oracle "
    "builders every family module uses.",
    "dashboard": "SURVEY §2.4 A4 / §2.6 O3 — dashboard analytics.",
    "dims": "SURVEY §2.5 W1-W2, §1.1 — dimension builders.",
    "facts": "SURVEY §2.3 J2-J3 + §2.4 A1 — fact builders.",
    "setops": "SURVEY §2.7 — set operations.",
    "semijoins": "SURVEY §2.3 — semi / anti joins.",
    "filters": "SURVEY §2.2 — filters / predicates / casts / conditionals.",
    "windows": "SURVEY §2.5 — window functions (beyond-reference rows).",
    "aggregates": "SURVEY §2.4 — aggregation suite.",
    "merge": "SURVEY §2.1 S9 — MERGE upsert semantics + the "
    "manifest-versioned table (time travel) rows.",
    "dedup": "North-star: deduplication (exact / fingerprint / n-gram "
    "Jaccard / MinHash-LSH / SimHash).",
    "similarity": "North-star: similarity search (ANN / IVF / LSH / "
    "quantization).",
    "textops": "North-star: text analysis (lang-ID, quality, tokens, "
    "TF-IDF, BPE).",
    "curation": "North-star: dedup clustering, sampling, curation, "
    "retrieval stats.",
    "multimodal": "North-star: multimodal plumbing — real pure-Python "
    "codecs (WAV/NPY/BMP/AVI), fingerprints, MIH hamming joins.",
    "streaming": "Streaming-equivalent semantics (batch-checkable "
    "twins of the streaming/ package).",
    "behavior": "Behavior analytics: funnel / cohort / transitions / "
    "decayed scoring.",
    "quality": "Pretraining-corpus quality gates + corpus-level "
    "sentence dedup.",
    "warehouse_a": "Classic warehouse shapes (TPC-H Q1/Q3/Q4/Q6/Q7/"
    "Q14/Q15/... analogs), part A.",
    "warehouse_b": "Remaining classic decision-support shapes (TPC-H "
    "Q2/Q8/Q11/... analogs), part B.",
    "stats_evals": "URL/domain curation tier + sketches + the "
    "statistics/eval tier (drift, calibration, golden records, "
    "retrieval health).",
    "graph_ml": "Link-analysis centrality, closed-form OLS, layout/"
    "pruning evals, and the round-10+ additions.",
}

SHARED_DOC_SUFFIX = (
    "\n\nSplit from the single-file queries.py (round 15). Modules are "
    "imported by registry/__init__.py in a FIXED order; every @_q call "
    "appends to the shared _REGISTRY in registry/core.py, so "
    "registration order (the driver's export order) is preserved "
    "byte-for-byte."
)


def banner_chunks(lines):
    bl = []
    for i, ln in enumerate(lines):
        if ln.startswith("# ---------------") and i + 1 < len(lines):
            nxt = lines[i + 1]
            if nxt.startswith("# ") and not nxt.startswith("# ---"):
                bl.append(i + 1)  # 1-based dash line
    bounds = [1] + bl + [len(lines) + 1]
    return bounds


def top_defs(stmts):
    names = set()
    for st in stmts:
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(st.name)
        elif isinstance(st, ast.Assign):
            for t in st.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
            names.add(st.target.id)
        elif isinstance(st, (ast.Import, ast.ImportFrom)):
            for a in st.names:
                names.add((a.asname or a.name).split(".")[0])
    return names


def main():
    src = open(SRC).read()
    lines = src.splitlines()
    tree = ast.parse(src)
    bounds = banner_chunks(lines)
    n_chunks = len(bounds) - 1
    assert n_chunks == len(PLAN), f"layout changed: {n_chunks} chunks vs plan {len(PLAN)}"

    def chunk_of(lineno):
        for ci in range(n_chunks):
            if bounds[ci] <= lineno < bounds[ci + 1]:
                return ci
        return n_chunks - 1

    chunk_stmts = defaultdict(list)
    for st in tree.body:
        chunk_stmts[chunk_of(st.lineno)].append(st)

    defs = {ci: top_defs(chunk_stmts[ci]) for ci in range(n_chunks)}
    refs = {}
    for ci in range(n_chunks):
        r = set()
        for st in chunk_stmts[ci]:
            for n in ast.walk(st):
                if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
                    r.add(n.id)
        refs[ci] = r

    # chunk -> module, module -> ordered chunk list
    chunk_mod = dict(PLAN)
    mod_chunks = defaultdict(list)
    for ci, m in PLAN:
        mod_chunks[m].append(ci)
    mod_order = []
    for _, m in PLAN:
        if m not in mod_order:
            mod_order.append(m)
    family_mods = [m for m in mod_order if m not in ("core", "__facade__")]

    def chunk_src(ci):
        lo, hi = bounds[ci], bounds[ci + 1] - 1
        return "\n".join(lines[lo - 1 : hi])

    def rel_rewrite(text):
        # parent-package relative imports gain a dot inside registry/
        return re.sub(r"\bfrom \.(?=[A-Za-z_])", "from ..", text)

    def mod_defs(m):
        out = set()
        for ci in mod_chunks[m]:
            out |= defs[ci]
        return out

    # name -> owning module (last definer wins, matching runtime)
    owner = {}
    for ci in range(n_chunks):
        for name in defs[ci]:
            owner[name] = chunk_mod[ci]

    os.makedirs(PKG, exist_ok=True)
    written = []

    # chunk 0 begins with the original module docstring — that stays
    # with the façade; core gets its own docstring, so drop it here
    # (else the generated docstring + it precede `from __future__`).
    orig_doc_end = (
        tree.body[0].end_lineno if isinstance(tree.body[0], ast.Expr) else 0
    )

    for m in ["core"] + family_mods:
        body_parts = [rel_rewrite(chunk_src(ci)) for ci in mod_chunks[m]]
        if m == "core" and orig_doc_end:
            body_parts[0] = "\n".join(
                body_parts[0].splitlines()[orig_doc_end:]
            ).lstrip("\n")
        # cross-module imports: names referenced here, defined in an
        # EARLIER chunk owned by a different module
        first_ci = mod_chunks[m][0]
        need = defaultdict(set)
        mine = mod_defs(m)
        for ci in mod_chunks[m]:
            for name in refs[ci]:
                if name in mine:
                    continue
                srcs = [c for c in range(first_ci) if name in defs[c]]
                if srcs:
                    src_mod = chunk_mod[max(srcs)]
                    if src_mod != m:
                        need[src_mod].add(name)
        header = [f'"""{DOCS[m]}{SHARED_DOC_SUFFIX}\n"""', ""]
        if m != "core":
            header.append("from __future__ import annotations")
            header.append("")
            for src_mod in mod_order:
                if src_mod in need:
                    names = sorted(need[src_mod])
                    line = f"from .{src_mod} import " + ", ".join(names)
                    if len(line) > 79:
                        line = (
                            f"from .{src_mod} import (\n    "
                            + ",\n    ".join(names)
                            + ",\n)"
                        )
                    header.append(line + "  # noqa: F401")
            header.append("")
        path = f"{PKG}/{m}.py"
        with open(path, "w") as f:
            f.write("\n".join(header) + "\n" + "\n".join(body_parts) + "\n")
        written.append(path)

    # __init__.py: import order IS registration order
    with open(f"{PKG}/__init__.py", "w") as f:
        f.write(
            '"""Query-registry package: one module per operator family.\n\n'
            "Import order below IS the registration order (every module's\n"
            "@_q calls append to core._REGISTRY as it is imported) and\n"
            "must stay byte-identical to the pre-split single-file order\n"
            "— the driver's export contract depends on it.\n"
            '"""\n\n'
            "from . import core  # noqa: F401\n"
            + "".join(f"from . import {m}  # noqa: F401,E402\n" for m in family_mods)
            + "\nALL_MODULES = [core, "
            + ", ".join(family_mods)
            + "]\n"
        )
    written.append(f"{PKG}/__init__.py")

    # facade: original docstring + re-export + exports chunk
    facade_ci = mod_chunks["__facade__"][0]
    doc_end = tree.body[0].end_lineno if isinstance(tree.body[0], ast.Expr) else 0
    facade = []
    facade.append("\n".join(lines[:doc_end]))
    facade.append("""
# Round 15: the registry body lives in yelp_data_pipeline_spark/registry/
# (one module per operator family, imported there in registration
# order). This façade re-exports EVERY symbol of every family module —
# public and private — so historical imports
# (`from yelp_data_pipeline_spark.queries import q_foo, _helper`)
# keep working unchanged, and defines the driver-facing export surface
# (_EXPORT_PRIORITY, registry/queries/oracle_sql).

from .registry import ALL_MODULES as _ALL_MODULES

for _m in _ALL_MODULES:
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith("__")}
    )
del _m
""")
    facade.append(chunk_src(facade_ci))
    with open(SRC, "w") as f:
        f.write("\n".join(facade) + "\n")
    written.append(SRC)

    for p in written:
        print(p, len(open(p).read().splitlines()), "lines")


if __name__ == "__main__":
    main()
