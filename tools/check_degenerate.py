"""Degenerate-input regression gate (round 13; ties fixture round 14).

Re-runs the degenerate sweeps behind BASELINE.md's contract sections
— the all-EMPTY fixture, the ONE-row fixture, and the all-TIES
fixture (two IDENTICAL rows per table: duplicate keys everywhere,
zero variance with n > 1, single-token text, empty props string) —
and asserts the failure set EQUALS the documented residual allowlist:

- a previously-FIXED query failing again is a regression → exit 1;
- a NEW failure is a regression → exit 1;
- a documented residual going green means the allowlist (and the
  BASELINE.md contract section) should be tightened → exit 1 with a
  "tighten" message, so the docs can never silently drift from
  reality.

Fixtures are derived from sf0.001 via DuckDB (schema-true, 0/1 rows)
into a temp directory, so the gate needs nothing pre-built. Usage:

    python tools/check_degenerate.py [src_sf_dir]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_data_pipeline_spark import TABLES  # noqa: E402

# The documented residuals (BASELINE.md round-13/14 contract sections).
# Round 14 closed the cube/rollup () grand-total residual (the
# aggregates.empty_grand_total limit(1)-gated fallback union) — the
# empty sweep now has ZERO allowed failures.
EMPTY_ALLOWED: set[str] = set()

ONE_ROW_ALLOWED = {
    # Data-derived-parameter preconditions that SHOULD raise on a
    # corpus that cannot satisfy them (typo'd-seed/ids safety).
    "personalized_pagerank_nation",
    "pq_recall_eval",
    "retrieval_health_report",
    "embedding_neardup_ivf",
    "kmeans_assignments",
    # Rank-1 covariance: the eigenvector direction is undefined, so
    # the power iteration's output is engine-dependent noise.
    "embedding_principal_component",
    "whitened_embedding_sample",
}

# Two rows with distinct keys but identical values everywhere (zero
# variance with n > 1, exact-dup content, single-token text, empty
# props): the degenerate-VALUE regime. Residuals are the same two
# documented contracts as the one-row sweep — nothing ties-specific
# survived round 14 (winnowing ''-serialization and the BPE encoder's
# fewer-than-`merges`-rules chain were fixed there).
TIES_ALLOWED = {
    # Data-derived-parameter preconditions that SHOULD raise (two
    # identical vectors cannot seed k distinct centroids / satisfy
    # eval preconditions; same class as ONE_ROW_ALLOWED).
    "personalized_pagerank_nation",
    "pq_recall_eval",
    "retrieval_health_report",
    "embedding_neardup_ivf",
    "kmeans_assignments",
    # Rank-1 covariance (two identical embeddings): eigenvector
    # direction undefined, engine-dependent output.
    "embedding_principal_component",
    "whitened_embedding_sample",
}


# Degenerate VALUE overrides for the ties fixture (ADVICE r13): the
# row-count fixtures can't exercise degenerate text shapes — a
# single-token doc is exactly what slipped past the r13 gate
# (packing_boundary_stats ANSI 0/0).
_TIES_OVERRIDES = {
    "documents": {"text": "'x'", "n_chars": "1"},
    "events": {"props": "''"},
}


def _build_fixture(src: str, dst: str, mode: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        one = f"SELECT * FROM '{src}/{t}.parquet' ORDER BY 1 LIMIT 1"
        if mode == "empty":
            sel = f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0"
        elif mode == "one":
            sel = one
        elif mode == "ties":
            desc = duckdb.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
            over = _TIES_OVERRIDES.get(t)
            if over:
                # CAST each literal override to the SOURCE column's
                # type (ADVICE r14): a bare `1 AS n_chars` would narrow
                # BIGINT→INTEGER in the written parquet, so the ties
                # sweep would exercise a different file schema than
                # production and could mask type-dependent drift.
                types = {name: typ for name, typ, *_ in desc}
                repl = ", ".join(
                    f"CAST({v} AS {types[k]}) AS {k}"
                    for k, v in over.items()
                )
                one = (
                    f"SELECT * REPLACE ({repl}) FROM '{src}/{t}.parquet' "
                    "ORDER BY 1 LIMIT 1"
                )
            # Two rows with DISTINCT keys (first column is every
            # table's leading key) but IDENTICAL values otherwise:
            # all ties, zero variance, exact-dup content — WITHOUT
            # violating the engine's unique-key loader contract
            # (duplicate keys make cross-engine divergence benign and
            # would drown the real signal).
            key = desc[0][0]
            sel = (
                f"WITH o AS ({one}) SELECT * FROM o "
                f"UNION ALL SELECT * REPLACE ({key} + 1 AS {key}) FROM o"
            )
        else:
            raise ValueError(mode)
        duckdb.sql(f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT parquet)")


def _sweep_failures(sf_dir: str) -> set[str]:
    env = dict(os.environ, SPARK_GRAFT_ANSI="true")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "check_oracle.py"),
            sf_dir,
        ],
        capture_output=True,
        text=True,
        env=env,
    )
    out = proc.stdout + proc.stderr
    m = re.search(r"FAILURES: ([a-z_0-9, ]+)", out)
    if m:
        return {n.strip() for n in m.group(1).split(",") if n.strip()}
    if "ALL GREEN" in out:
        return set()
    raise RuntimeError(
        f"sweep at {sf_dir} produced neither FAILURES nor ALL GREEN "
        f"(rc={proc.returncode}); tail:\n{out[-2000:]}"
    )


def _gate(name: str, got: set[str], allowed: set[str]) -> list[str]:
    problems = []
    regressions = sorted(got - allowed)
    if regressions:
        problems.append(
            f"{name}: REGRESSION — previously-green queries now fail: "
            f"{regressions}"
        )
    tighten = sorted(allowed - got)
    if tighten:
        problems.append(
            f"{name}: allowlist stale — documented residuals now pass "
            f"(tighten the list + BASELINE.md): {tighten}"
        )
    return problems


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    problems: list[str] = []
    with tempfile.TemporaryDirectory(prefix="degen_") as tmp:
        empty = os.path.join(tmp, "sf_empty")
        one = os.path.join(tmp, "sf_one")
        ties = os.path.join(tmp, "sf_ties")
        _build_fixture(src, empty, "empty")
        _build_fixture(src, one, "one")
        _build_fixture(src, ties, "ties")

        got_empty = _sweep_failures(empty)
        print(f"empty sweep: {len(got_empty)} failures -> {sorted(got_empty)}")
        problems += _gate("empty", got_empty, EMPTY_ALLOWED)

        got_one = _sweep_failures(one)
        print(f"one-row sweep: {len(got_one)} failures -> {sorted(got_one)}")
        problems += _gate("one-row", got_one, ONE_ROW_ALLOWED)

        got_ties = _sweep_failures(ties)
        print(f"ties sweep: {len(got_ties)} failures -> {sorted(got_ties)}")
        problems += _gate("ties", got_ties, TIES_ALLOWED)

    for p in problems:
        print("GATE:", p)
    print("DEGENERATE GATE", "RED" if problems else "GREEN")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
