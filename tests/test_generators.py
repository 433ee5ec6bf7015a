"""Generator-family coherence (ADVICE r11): the subset generator must
produce byte-identical tables to the full generator at the same SF, so
cross-decade scaling ratios computed against mixed full/subset dirs
stay within one generator family."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.parametrize("tbl", ["customer", "events", "documents"])
def test_subset_generator_matches_full(tmp_path, tbl):
    import gen_sf
    from gen_sf_subset import generate_subset

    full = tmp_path / "full"
    sub = tmp_path / "sub"
    gen_sf.generate(0.001, str(full))
    generate_subset(0.001, str(sub), (tbl,))
    a = (full / f"{tbl}.parquet").read_bytes()
    b = (sub / f"{tbl}.parquet").read_bytes()
    assert a == b
