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
   order as the tiebreak — the rotation that keeps the two-round
   invariant: every query green in round N or N-1.

A driver row counts as green when it has no error and row count, schema,
and value hash all match; a ``no_oracle`` row counts as checked (the
rows-only check is the strongest the driver can run for it).

The full ordering (every registered query) is written to
``financial_data_engineering_spark/queries/gate_window.py``; the
registry's ``reorder`` applies it at import. ``--check`` exits 1 when
the committed file is stale (wired into tests/test_registry.py, like
the README counts).

Usage: python tools/gen_gate_window.py [--check]
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")

OUT_PATH = "financial_data_engineering_spark/queries/gate_window.py"

#: Names whose semantics changed after their last driver-green row and
#: must therefore re-verify at the head of the next window. Add in the
#: same commit as the semantic change; remove once a CORRECTNESS file
#: shows the new green row.
FORCE_FIRST: list[str] = []


def _is_checked(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        return bool(row.get("spark_rows"))
    return (
        not row.get("err")
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match"))
    )


def last_green_rounds() -> dict[str, int]:
    """name -> latest round with a green (or no-oracle checked) row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if _is_checked(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_window() -> list[tuple[str, int | None]]:
    """Full registry ordering as (name, last_green_round|None) pairs."""
    from financial_data_engineering_spark.queries import registry

    # Import for registration side effects WITHOUT applying any existing
    # generated ordering: the package __init__ itself imports gate_window,
    # but registration order is preserved for never-seen names because
    # reorder only moves listed names (new names keep import order).
    import financial_data_engineering_spark.queries  # noqa: F401

    reg_order = list(registry.all_queries())
    pos = {n: i for i, n in enumerate(reg_order)}
    greens = last_green_rounds()
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


def render(pairs: list[tuple[str, int | None]]) -> str:
    lines = [
        '"""Driver gate window ordering — GENERATED, do not edit.',
        "",
        "Regenerate with ``python tools/gen_gate_window.py`` (CI asserts",
        "freshness via --check). Policy and provenance live in the",
        "generator's docstring; the trailing comment on each line is the",
        "query's latest driver-green round (never = no driver row yet).",
        '"""',
        "",
        "GATE_WINDOW = [",
    ]
    for name, rnd in pairs:
        tag = f"r{rnd}" if rnd else "never"
        lines.append(f'    "{name}",  # {tag}')
    lines.append("]")
    return "\n".join(lines) + "\n"


def main() -> None:
    check = "--check" in sys.argv
    text = render(compute_window())
    try:
        current = open(OUT_PATH).read()
    except FileNotFoundError:
        current = None
    if check:
        if current != text:
            print(
                f"{OUT_PATH} is stale — regenerate with "
                "python tools/gen_gate_window.py",
                file=sys.stderr,
            )
            raise SystemExit(1)
        print(f"{OUT_PATH} up to date")
        return
    if current != text:
        with open(OUT_PATH, "w") as f:
            f.write(text)
        print(f"{OUT_PATH} regenerated")
    else:
        print(f"{OUT_PATH} already current")


if __name__ == "__main__":
    main()
