"""Regenerate ``CATALOG.md`` — the human-readable inventory of every
registered query, in harness exposure order.

Run: ``python -m twitch_stream_data_pipeline_spark.plans.dump_catalog``
"""

from __future__ import annotations

from .catalog import CATALOG, EXPOSURE_ORDER

HEADER = [
    "# Query catalog",
    "",
    "Auto-generated from `plans/catalog.py` (`python -m "
    "twitch_stream_data_pipeline_spark.plans.dump_catalog`). One row per "
    "registered query: harness exposure position (the external "
    "correctness harness grades positions 1-50), oracle presence, tags, "
    "and the plan-shape summary from the registration docstring.",
    "",
    "| # | query | oracle | tags | summary |",
    "|---|-------|--------|------|---------|",
]


def render() -> str:
    lines = list(HEADER)
    for i, name in enumerate(EXPOSURE_ORDER, 1):
        q = CATALOG[name]
        doc = " ".join(q.doc.split())
        if len(doc) > 220:
            doc = doc[:217] + "..."
        oracle = "sql" if q.oracle else "rows-only"
        lines.append(
            f"| {i} | `{name}` | {oracle} | {', '.join(q.tags)} | {doc} |"
        )
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    with open("CATALOG.md", "w") as f:
        f.write(render())
    print(f"wrote CATALOG.md ({len(EXPOSURE_ORDER)} queries)")
