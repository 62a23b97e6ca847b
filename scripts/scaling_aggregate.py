"""Aggregate the round's interleaved scaling pairs across runs.

The north-rule criterion is a MEDIAN over same-window (2,8)-core
pairs; single 10-pair batches are hostage to the sandbox VM's hourly
delivered-CPU weather, so the round headline pools every fresh pair
measured this round (each batch is already committed verbatim in
BENCH/BASELINE.md) and reports the pooled raw + calibration-
normalized medians.  Usage:

    python scripts/scaling_aggregate.py [n_last_sections]

Parses the last N ``## Scaling run`` sections of BENCH/BASELINE.md
(default 2), pools their pairs, and appends a ``## Scaling aggregate``
section with both medians, the full sorted pair lists, and the
per-batch provenance (run timestamps + pair counts).
"""

from __future__ import annotations

import json
import re
import sys


def parse_sections(text: str):
    """[(timestamp, [(j2, j8), ...]), ...] in file order."""
    out = []
    for m in re.finditer(r"^## Scaling run (\S+)$", text, re.M):
        start = m.end()
        nxt = text.find("\n## ", start)
        body = text[start : nxt if nxt != -1 else len(text)]
        pairs = {}
        for pm in re.finditer(
            r"^- raw JSON @(\d) pair (\d+): (\{.*\})$", body, re.M
        ):
            cores, idx, js = int(pm.group(1)), int(pm.group(2)), pm.group(3)
            pairs.setdefault(idx, {})[cores] = json.loads(js)
        plist = [
            (p[2], p[8]) for _, p in sorted(pairs.items()) if 2 in p and 8 in p
        ]
        out.append((m.group(1), plist))
    return out


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main(n_last: int = 2) -> None:
    path = "BENCH/BASELINE.md"
    text = open(path).read()
    sections = parse_sections(text)[-n_last:]
    raw_effs, norm_effs = [], []
    prov = []
    for ts, plist in sections:
        for a, b in plist:
            r = (b["pip_join_docs_per_sec"] / a["pip_join_docs_per_sec"]) / 4.0
            raw_effs.append(r)
            norm_effs.append(
                r * (a["cpu_calib_iters_per_sec"] / b["cpu_calib_iters_per_sec"])
            )
        prov.append(f"{ts} ({len(plist)} pairs)")
    if not raw_effs:
        sys.exit("no pairs found")
    rm, nm = median(raw_effs), median(norm_effs)
    lines = f"""
## Scaling aggregate — round pooled pairs

Pooled over {len(raw_effs)} fresh interleaved (2,8)-core pairs from
{len(sections)} batches this round ({'; '.join(prov)}); batches run
in different host-weather windows, so the pooled median is the
round's most drift-robust statistic (each batch's raw JSONs above
are the provenance).

- **spatial-join throughput scaling efficiency (N=2 -> 4N=8), pooled
  median — calibration-normalized: {nm:.3f}, raw: {rm:.3f}**
  (north_rule criterion >= 0.8: normalized {"MET" if nm >= 0.8 else "NOT MET"},
  raw {"MET" if rm >= 0.8 else "NOT MET"})
- normalized pairs: {', '.join(f'{e:.3f}' for e in sorted(norm_effs))}
- raw pairs: {', '.join(f'{e:.3f}' for e in sorted(raw_effs))}
"""
    with open(path, "a") as f:
        f.write(lines)
    print(lines)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
