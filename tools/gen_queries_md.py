"""Regenerate QUERIES.md from the live query registry."""

from __future__ import annotations

import inspect
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry


def main() -> None:
    qs, oracles = merged_registry()
    lines = [
        "# Query surface",
        "",
        "Auto-generated index of every registered query (`__spark_entry__.queries()`).",
        '"oracle" = DuckDB hash-checked by the driver at sf0.01; "rows" = rows-only',
        "by design (approximate / hash-family operators, each anchored by an exact",
        "oracle-checked twin and property tests). Regenerate with",
        "`python tools/gen_queries_md.py`.",
        "",
        "| # | Query | Check | Module | Summary |",
        "|---|---|---|---|---|",
    ]
    for i, name in enumerate(sorted(qs), 1):
        fn = qs[name]
        # first PARAGRAPH (joined across source-line wraps), then cap
        para = (inspect.getdoc(fn) or "").strip().split("\n\n")[0]
        doc = " ".join(line.strip() for line in para.split("\n")).strip()
        if len(doc) > 110:
            doc = doc[:107] + "..."
        mod = fn.__module__.split(".")[-1]
        check = "oracle" if name in oracles else "rows"
        doc = doc.replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {check} | plans/{mod} | {doc} |")
    n_oracle = sum(1 for n in qs if n in oracles)
    lines += [
        "",
        f"**{len(qs)} queries: {n_oracle} oracle-checked, "
        f"{len(qs) - n_oracle} rows-only.**",
        "",
    ]
    out = pathlib.Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}: {len(qs)} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
