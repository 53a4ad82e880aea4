"""Build BENCH/SF1.md from two check_correctness gate logs.

The sf1 scale soak (VERDICT r2 item 1) runs the full gate at sf0.1 and
sf1 (10x the data) and reports, per query, the Spark wall-time at both
scales plus the time ratio.  A plan whose cost is linear-ish in the
input should show ratio <~ the data ratio (10); anything far above is
flagged super-linear.  Usage::

    python tools/sf1_report.py /tmp/gate_sf01.log /tmp/gate_sf1.log > BENCH/SF1.md
"""

from __future__ import annotations

import re
import sys

LINE = re.compile(
    r"(?P<name>[a-z0-9_]+): (?:OK rows=(?P<rows>\d+) "
    r"\[spark (?P<spark>[0-9.]+)s, duck (?P<duck>[0-9.]+)s\]"
    r"|rows=(?P<ro_rows>\d+) \((?P<ro_note>[^)]*)\) \[(?P<ro_spark>[0-9.]+)s\]"
    r"|(?:SCHEMA |ROWCOUNT |VALUE )MISMATCH(?P<mis>.*))"
)

DATA_RATIO = 10.0
FLAG_RATIO = 20.0  # > 2x the data ratio => super-linear suspect


def parse(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    with open(path, errors="replace") as fh:
        text = fh.read().replace("\r", "\n")
    for m in LINE.finditer(text):
        name = m.group("name")
        if m.group("mis") is not None:
            out[name] = {"status": "MISMATCH"}
        elif m.group("ro_rows") is not None:
            out[name] = {
                "status": "rows-only",
                "note": m.group("ro_note"),
                "rows": int(m.group("ro_rows")),
                "spark": float(m.group("ro_spark")),
            }
        else:
            out[name] = {
                "status": "OK",
                "rows": int(m.group("rows")),
                "spark": float(m.group("spark")),
                "duck": float(m.group("duck")),
            }
    return out


def main() -> int:
    small_log, big_log = sys.argv[1], sys.argv[2]
    lo = sys.argv[3] if len(sys.argv) > 3 else "sf0.1"
    hi = sys.argv[4] if len(sys.argv) > 4 else "sf1"
    small, big = parse(small_log), parse(big_log)
    names = [n for n in big if n in small]
    missing = [n for n in small if n not in big] + [
        n for n in big if n not in small
    ]
    rows = []
    for n in names:
        s, b = small[n], big[n]
        if "spark" not in s or "spark" not in b:
            continue
        ratio = b["spark"] / max(s["spark"], 0.05)
        rows.append((n, s, b, ratio))
    rows.sort(key=lambda r: -r[3])

    flagged = [r for r in rows if r[3] > FLAG_RATIO]
    total_s = sum(r[1]["spark"] for r in rows)
    total_b = sum(r[2]["spark"] for r in rows)
    mism = [n for n, d in big.items() if d["status"] == "MISMATCH"]

    print(f"# Scale soak: {lo} -> {hi} (10x data)")
    print()
    ro = [d for d in big.values() if d["status"] == "rows-only"]
    ro_timeout = sum(1 for d in ro if "timeout" in d.get("note", ""))
    print(
        f"Full gate (`tools/check_correctness.py`, Spark vs DuckDB oracle)"
        f" run at BOTH scales on the same VM, sequentially (never"
        f" concurrent).  {len(big)} queries at {hi}:"
        f" {sum(1 for d in big.values() if d['status'] == 'OK')} value-matched,"
        f" {len(ro) - ro_timeout} rows-only by contract"
        f" (seeded/SQL-inexpressible), {ro_timeout} rows-only at {hi} only"
        f" because the deliberately-naive quadratic DuckDB twin exceeds its"
        f" 240s budget there (each is value-matched at the scales where"
        f" the twin is tractable),"
        f" {len(mism)} mismatches."
    )
    print()
    print(
        f"Aggregate Spark wall: {total_s:.1f}s at {lo} -> {total_b:.1f}s at"
        f" {hi} = **{total_b / total_s:.1f}x on 10x data** across"
        f" {len(rows)} timed queries."
    )
    print()
    if mism:
        print(f"**MISMATCHES at {hi}: {', '.join(mism)}**")
        print()
    if missing:
        print(f"Queries present in only one log: {', '.join(missing)}")
        print()
    print(
        f"Flagged super-linear (time ratio > {FLAG_RATIO:.0f}x on"
        f" {DATA_RATIO:.0f}x data): "
        + (", ".join(f"`{r[0]}` ({r[3]:.1f}x)" for r in flagged) or "none")
    )
    print()
    print(f"| query | {lo} spark (s) | {hi} spark (s) | ratio | {hi} duck (s) | {hi} rows |")
    print("|---|---|---|---|---|---|")
    for n, s, b, ratio in rows:
        duck = f"{b['duck']:.1f}" if "duck" in b else "—"
        flag = " ⚠" if ratio > FLAG_RATIO else ""
        print(
            f"| {n}{flag} | {s['spark']:.1f} | {b['spark']:.1f} |"
            f" {ratio:.1f}x | {duck} | {b['rows']} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
