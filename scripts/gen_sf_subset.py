"""Generate ONLY the events + documents tables of the gen_sf family at
an arbitrary scale factor — the decade-4 probe input (VERDICT r10 item
7: one gen_sf30–50 point for the three steepest decade-3 scalers, T28 /
EX2 / J9, which read only these two tables; generating the full sf40
lineitem tree would cost ~20 GB of RAM and minutes of compute for
tables the probe never opens).

The two blocks are copied VERBATIM from scripts/gen_sf.py (seeds 106 /
107 and all shape constants), so ratios computed against the full
gen_sf dirs stay within one generator family — keep them in sync with
any gen_sf.py change.

Usage: python scripts/gen_sf_subset.py SF OUTDIR
"""

from __future__ import annotations

import os
import sys

import numpy as np

from gen_sf import LANGS, EVENT_TYPES, VOCAB, _write


def generate_subset(sf: float, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_user = int(15_000 * sf)

    rng = np.random.default_rng(106)
    secs = np.sort(rng.uniform(0, 30 * 86400, n_ev))
    _write(outdir, "events", {
        "event_id": np.arange(n_ev),
        "ts": (np.datetime64("2024-01-01")
               + (secs * 1e6).astype("timedelta64[us]")),
        "user_id": rng.integers(0, n_user, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)],
    })

    rng = np.random.default_rng(107)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.05:
            base = texts[int(rng.integers(0, i))].split(" ")
            if r < 0.002:
                texts.append(" ".join(base))  # exact dup
                continue
            for _ in range(3):
                base[int(rng.integers(0, len(base)))] = "dup"
            texts.append(" ".join(base))
        else:
            nw = int(rng.integers(10, 101))
            texts.append(" ".join(
                VOCAB[j] for j in rng.integers(0, len(VOCAB), nw)
            ))
    _write(outdir, "documents", {
        "doc_id": np.arange(n_doc),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    generate_subset(sf, outdir)
    print(f"generated events+documents sf={sf} at {outdir}")
