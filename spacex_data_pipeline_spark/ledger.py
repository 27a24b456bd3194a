"""Driver-verification ledger — the hard signal as a generated artifact.

Every round the driver hash-checks the first 50 ``queries()`` entries
against their DuckDB oracles and records per-entry rows+schema+hash
matches in ``CORRECTNESS_r{N}.json`` (repo root). Those artifacts ARE
the product's external evidence; this module folds them into one table
— entry → first-green round → last-green round → pending/green — so the
coverage claim is derived from the recorded facts, never hand-tallied
(VERDICT r11 "next round" #7). ``LEDGER.md`` is the rendered table;
``tests/test_registry_window.py`` asserts it is in sync with both the
artifacts and the live registry, and the count header is pinned to
``len(REGISTRY)`` like every other coverage doc.

A row is GREEN for round N iff its CORRECTNESS_r{N}.json record has
``rows_match`` and ``schema_match`` and ``hash_match`` all true — the
driver's own strictness, no weaker rows-only credit.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def green_rounds(root: Path | None = None) -> dict[str, list[int]]:
    """entry name → sorted rounds with a fully-green driver row."""
    root = root or REPO_ROOT
    out: dict[str, list[int]] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(f.read_text())
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out.setdefault(name, []).append(rnd)
    for rounds in out.values():
        rounds.sort()
    return out


def render(registry_names: list[str], root: Path | None = None) -> str:
    """The LEDGER.md text for the given registry order."""
    greens = green_rounds(root)
    n = len(registry_names)
    n_green = sum(1 for name in registry_names if name in greens)
    lines = [
        "# Driver-verification ledger",
        "",
        f"Generated from `CORRECTNESS_r*.json` by `spacex_data_pipeline_spark."
        f"ledger` (regenerate: `python -m spacex_data_pipeline_spark ledger"
        f" > LEDGER.md`; `tests/test_registry_window.py` asserts sync).",
        "",
        f"**Registry: {n} entries — {n_green} driver-green, "
        f"{n - n_green} awaiting their first driver window.** A round is "
        "listed only if the driver recorded rows+schema+hash ALL matching "
        "(its full strictness). Entries not yet driver-checked gate on the "
        "local oracle replica (`tests/test_oracle_parity.py`, the same "
        "strictness) until their window comes up.",
        "",
        "| entry | first green | last green | driver rounds |",
        "|---|---|---|---|",
    ]
    for name in registry_names:
        rounds = greens.get(name)
        if rounds:
            shown = ",".join(f"r{r}" for r in rounds)
            lines.append(f"| {name} | r{rounds[0]} | r{rounds[-1]} | {shown} |")
        else:
            lines.append(f"| {name} | — | — | pending (local replica green) |")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    from .queries import REGISTRY

    print(render(list(REGISTRY)), end="")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
