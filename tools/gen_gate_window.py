"""Generate the driver gate window ordering from correctness history.

The driver verifies a bounded (~50) window from the registry head each
round, so registry order IS verification priority. Round 6's verdict
flagged the hand-maintained GATE_WINDOW list as drift-prone past 110
queries; this tool derives it instead, from the exact evidence the
policy names:

1. queries with NO driver-green row in any committed CORRECTNESS_r*.json
   — new registrations — come first, in registration (import) order, so
   a query registered at ANY point during a round is automatically at
   the head of the next window (closing the late-registration gap the
   r5/r6 verdicts called out);
2. then FORCE_FIRST: queries whose fn/oracle SEMANTICS changed since
   their last driver-green row (the one judgment the history cannot
   make — list such names here in the same commit as the change, remove
   them once re-verified);
3. then every verified query, oldest driver-green round first, registry
   order as the tiebreak.

Freshness invariant (restated r11, per the r10 verdict): with R
registered queries and a ~50-row driver window, the achievable bound is
"every query driver-green within the last ceil(R/50) rounds" (4 rounds
at R=156). The old "green in round N or N-1" wording was only possible
below ~100 queries; oldest-first rotation is exactly the schedule that
attains the ceil(R/50) bound.

A driver row counts as green when it has no error and row count, schema,
and value hash all match. A ``no_oracle`` row counts as checked ONLY for
queries that still have no registered oracle (the rows-only check is the
strongest the driver can run for those); for a query that HAS an oracle
today, a historical ``no_oracle`` row means the oracle was missing or
broken at the time — it must not satisfy the freshness policy (the
round-9 verdict's bpe_learned_merges finding).

The full ordering (every registered query) is written to
``financial_data_engineering_spark/queries/gate_window.py`` together
with a ``GATE_WINDOW_INPUTS`` digest of the CORRECTNESS files it was
generated from. ``--check`` validates against those *declared* inputs,
not the current glob: the driver writes ``CORRECTNESS_r{N}.json`` AFTER
the round's final commit, so a freshly-appeared newer round must not
flunk the committed file (the round-7 boundary race). Staleness is:
a declared input changed or vanished, an input OLDER than the newest
declared round appeared undeclared, or the committed ordering does not
match regeneration from the declared inputs.

Usage: python tools/gen_gate_window.py [--check]
"""

from __future__ import annotations

import glob
import hashlib
import json
import re
import sys

sys.path.insert(0, ".")

OUT_PATH = "financial_data_engineering_spark/queries/gate_window.py"

#: Names whose semantics changed after their last driver-green row and
#: must therefore re-verify at the head of the next window. Add in the
#: same commit as the semantic change; remove once a CORRECTNESS file
#: shows the new green row.
FORCE_FIRST: list[str] = [
    # (r10 entries source_bigram_lm_quality / hll_priority_union /
    # hll_distinct_orders cleared: all three hash-matched green in
    # CORRECTNESS_r10.json.)
]


def _round_of(path: str) -> int | None:
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else None


def correctness_files() -> list[str]:
    return sorted(
        p for p in glob.glob("CORRECTNESS_r*.json") if _round_of(p) is not None
    )


def _digest(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _oracled_names() -> set[str]:
    """Names that currently have a registered DuckDB oracle."""
    import financial_data_engineering_spark.queries as q  # noqa: F401

    return set(q.all_oracles())


def _is_checked(row: dict, has_oracle: bool) -> bool:
    if row.get("err") == "no_oracle":
        # Rows-only is the strongest possible check ONLY for queries
        # that still have no oracle; otherwise the row records a gap
        # that has since been closed and must re-verify (r9 verdict).
        return not has_oracle and bool(row.get("spark_rows"))
    return (
        not row.get("err")
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match"))
    )


def last_green_rounds(paths: list[str] | None = None) -> dict[str, int]:
    """name -> latest round with a green (or no-oracle checked) row."""
    latest: dict[str, int] = {}
    oracled = _oracled_names()
    for path in correctness_files() if paths is None else paths:
        rnd = _round_of(path)
        if rnd is None:
            continue
        for name, row in json.load(open(path)).items():
            if _is_checked(row, name in oracled):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_window(paths: list[str]) -> list[tuple[str, int | None]]:
    """Full registry ordering as (name, last_green_round|None) pairs."""
    from financial_data_engineering_spark.queries import registry

    # Import for registration side effects WITHOUT applying any existing
    # generated ordering: the package __init__ itself imports gate_window,
    # but registration order is preserved for never-seen names because
    # reorder only moves listed names (new names keep import order).
    import financial_data_engineering_spark.queries  # noqa: F401

    reg_order = list(registry.all_queries())
    pos = {n: i for i, n in enumerate(reg_order)}
    greens = last_green_rounds(paths)
    force = set(FORCE_FIRST)
    unknown = sorted(force - set(pos))
    if unknown:
        raise SystemExit(f"FORCE_FIRST names not registered: {unknown}")

    def key(name: str):
        if name not in greens:
            return (0, 0, pos[name])
        if name in force:
            return (1, 0, pos[name])
        return (2, greens[name], pos[name])

    ordered = sorted(reg_order, key=key)
    return [(n, greens.get(n)) for n in ordered]


def render(pairs: list[tuple[str, int | None]], paths: list[str]) -> str:
    lines = [
        '"""Driver gate window ordering — GENERATED, do not edit.',
        "",
        "Regenerate with ``python tools/gen_gate_window.py`` (CI asserts",
        "freshness via --check against GATE_WINDOW_INPUTS below, so a",
        "driver-written CORRECTNESS file newer than the last regeneration",
        "does not flunk the committed ordering). Policy and provenance",
        "live in the generator's docstring; the trailing comment on each",
        "line is the query's latest driver-green round (never = no",
        "driver row yet).",
        '"""',
        "",
        "#: CORRECTNESS files this ordering derives from (path -> sha256/16).",
        "GATE_WINDOW_INPUTS = {",
    ]
    for path in paths:
        lines.append(f'    "{path}": "{_digest(path)}",')
    lines += [
        "}",
        "",
        "GATE_WINDOW = [",
    ]
    for name, rnd in pairs:
        tag = f"r{rnd}" if rnd is not None else "never"
        lines.append(f'    "{name}",  # {tag}')
    lines.append("]")
    return "\n".join(lines) + "\n"


def _declared_inputs(text: str) -> dict[str, str] | None:
    """Parse GATE_WINDOW_INPUTS from a committed gate_window.py body."""
    m = re.search(r"GATE_WINDOW_INPUTS = \{(.*?)\}", text, re.S)
    if not m:
        return None
    return dict(re.findall(r'"([^"]+)":\s*"([0-9a-f]+)"', m.group(1)))


def check() -> None:
    try:
        current = open(OUT_PATH).read()
    except FileNotFoundError:
        raise SystemExit(f"{OUT_PATH} missing — run python tools/gen_gate_window.py")
    declared = _declared_inputs(current)
    if declared is None:
        raise SystemExit(
            f"{OUT_PATH} predates input digests — regenerate with "
            "python tools/gen_gate_window.py"
        )
    present = correctness_files()
    max_declared = max((_round_of(p) or 0 for p in declared), default=0)
    stale: list[str] = []
    for path, digest in declared.items():
        try:
            if _digest(path) != digest:
                stale.append(f"declared input changed: {path}")
        except FileNotFoundError:
            stale.append(f"declared input missing: {path}")
    for path in present:
        if path not in declared and (_round_of(path) or 0) <= max_declared:
            stale.append(f"undeclared input not newer than r{max_declared}: {path}")
    if not stale:
        expected = render(compute_window(sorted(declared)), sorted(declared))
        if current != expected:
            stale.append("ordering does not match regeneration from declared inputs")
    if stale:
        for reason in stale:
            print(f"{OUT_PATH} is stale — {reason}", file=sys.stderr)
        print("regenerate with python tools/gen_gate_window.py", file=sys.stderr)
        raise SystemExit(1)
    newer = [p for p in present if p not in declared]
    suffix = f" (newer rounds pending next regeneration: {newer})" if newer else ""
    print(f"{OUT_PATH} up to date{suffix}")


def main() -> None:
    if "--check" in sys.argv:
        check()
        return
    paths = correctness_files()
    text = render(compute_window(paths), paths)
    try:
        current = open(OUT_PATH).read()
    except FileNotFoundError:
        current = None
    if current != text:
        with open(OUT_PATH, "w") as f:
            f.write(text)
        print(f"{OUT_PATH} regenerated")
    else:
        print(f"{OUT_PATH} already current")


if __name__ == "__main__":
    main()
