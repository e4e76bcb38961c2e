"""Generate GATES.md: one line per registered gate — name, oracle kind,
first docstring sentence. The cross-check index for SURVEY.md §2."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str) -> str:
    if not doc:
        return ""
    text = " ".join(line.strip() for line in doc.strip().splitlines())
    for stop in (". ", ".\n"):
        if stop in text:
            return text.split(stop)[0] + "."
    return text[:220]


def main():
    from connectors_spark import entry_queries as eq

    qs, osql = eq.queries(), eq.oracle_sql()
    rows = []
    for name in sorted(qs):
        kind = "DuckDB-hash" if name in osql else "rows-only"
        rows.append(f"| `{name}` | {kind} | "
                    f"{first_sentence(qs[name].__doc__)} |")
    out = [
        "# GATES — every driver-gate query, one line each\n",
        f"\n{len(qs)} gates ({len(osql)} DuckDB-hash-verified, "
        f"{len(qs) - len(osql)} rows-only). Regenerate: "
        "`python tools/dump_gates.py`.\n",
        "\n| gate | check | what it computes |\n|---|---|---|\n",
        "\n".join(rows), "\n",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "GATES.md"), "w") as f:
        f.write("".join(out))
    print(f"GATES.md written ({len(qs)} gates)")


if __name__ == "__main__":
    main()
