"""Generate a SUBSET of the gen_sf tables at an arbitrary scale factor
— the decade-4 probe input (VERDICT r10 item 7: one gen_sf30–50 point
for the steepest decade-3 scalers, which read only a couple of tables;
generating the full sf40 lineitem tree would cost ~20 GB of RAM and
minutes of compute for tables the probe never opens).

The table builders are the SAME functions scripts/gen_sf.py calls
(ADVICE r11 closed the copied-block drift hazard): each table's seed
and shape constants live in exactly one place, so ratios computed
against full gen_sf dirs stay within one generator family by
construction.

Usage: python scripts/gen_sf_subset.py SF OUTDIR [table ...]
       (default tables: events documents)
"""

from __future__ import annotations

import os
import sys

from gen_sf import gen_customer, gen_documents, gen_events

BUILDERS = {
    "customer": gen_customer,
    "events": gen_events,
    "documents": gen_documents,
}


def generate_subset(
    sf: float, outdir: str, tables: tuple[str, ...] = ("events", "documents")
) -> None:
    os.makedirs(outdir, exist_ok=True)
    for t in tables:
        BUILDERS[t](sf, outdir)


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    tables = tuple(sys.argv[3:]) or ("events", "documents")
    generate_subset(sf, outdir, tables)
    print(f"generated {' '.join(tables)} sf={sf} at {outdir}")
