"""Read-only analysis for the queries.py family split: chunk the file
at its section banners, compute per-chunk top-level definitions and
name references, and report cross-chunk dependencies, FORWARD
references (chunk N using a name only defined in chunk M>N — would
break a module split), and cross-chunk name collisions."""

from __future__ import annotations

import ast
import sys
from collections import defaultdict

SRC = "/root/repo/yelp_data_pipeline_spark/queries.py"


def banner_lines(lines: list[str]) -> list[tuple[int, str]]:
    out = []
    for i, ln in enumerate(lines):
        if ln.startswith("# ---------------") and i + 1 < len(lines):
            nxt = lines[i + 1]
            if nxt.startswith("# ") and not nxt.startswith("# ---"):
                out.append((i + 1, nxt[2:].strip()))  # 1-based banner line
    return out


def main() -> int:
    src = open(SRC).read()
    lines = src.splitlines()
    tree = ast.parse(src)
    banners = banner_lines(lines)
    # Chunk 0 = header (module docstring + imports + QuerySpec etc.)
    bounds = [1] + [b[0] for b in banners] + [len(lines) + 1]
    titles = ["<header>"] + [b[1] for b in banners]

    def chunk_of(lineno: int) -> int:
        for ci in range(len(bounds) - 1):
            if bounds[ci] <= lineno < bounds[ci + 1]:
                return ci
        return len(bounds) - 2

    defs: dict[int, set[str]] = defaultdict(set)   # chunk -> names defined
    def_chunks: dict[str, list[int]] = defaultdict(list)
    stmt_chunk: list[tuple[ast.stmt, int]] = []
    for st in tree.body:
        ci = chunk_of(st.lineno)
        stmt_chunk.append((st, ci))
        names: set[str] = set()
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
        for n in names:
            defs[ci].add(n)
            if ci not in def_chunks[n]:
                def_chunks[n].append(ci)

    refs: dict[int, set[str]] = defaultdict(set)
    for st, ci in stmt_chunk:
        for n in ast.walk(st):
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
                refs[ci].add(n.id)

    print(f"{len(titles)} chunks:")
    for ci, t in enumerate(titles):
        n_defs = len(defs[ci])
        span = f"{bounds[ci]}-{bounds[ci+1]-1}"
        print(f"  [{ci:2d}] L{span:>13} defs={n_defs:3d}  {t[:70]}")

    all_defined = set(def_chunks)
    print("\nCross-chunk deps (chunk -> earlier chunks it needs):")
    forward = []
    for ci in range(len(titles)):
        need = defaultdict(set)
        for name in refs[ci]:
            if name in defs[ci] or name not in all_defined:
                continue
            srcs = def_chunks[name]
            earlier = [c for c in srcs if c < ci]
            if earlier:
                need[max(earlier)].add(name)
            else:
                forward.append((ci, name, srcs))
        if need:
            summary = ", ".join(
                f"{c}({len(ns)})" for c, ns in sorted(need.items())
            )
            print(f"  [{ci:2d}] <- {summary}")

    print("\nFORWARD refs (split-breaking):")
    for ci, name, srcs in forward:
        print(f"  chunk {ci} uses {name!r} defined only in {srcs}")
    if not forward:
        print("  none")

    print("\nName collisions (defined in >1 chunk AND referenced elsewhere):")
    hits = 0
    for name, cs in sorted(def_chunks.items()):
        if len(cs) < 2:
            continue
        outside = [ci for ci in refs if name in refs[ci] and ci not in cs]
        if outside:
            hits += 1
            print(f"  {name!r} defined in {cs}, referenced from {outside}")
    if not hits:
        print("  none")
    return 0


if __name__ == "__main__":
    sys.exit(main())
