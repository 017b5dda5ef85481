"""fast-chain kernel: bit-exact parity vs the compiled reference binary."""

import numpy as np
import pytest

from genarchbench_tpu.kernels import fast_chain as fc_mod
from tests.synth import gen_chain_input
from tests.test_chain import run_ref


def run_ours(input_text, tmp_path):
    inp = tmp_path / "in.txt"
    out = tmp_path / "out_tpu.txt"
    inp.write_text(input_text)
    fc_mod.run(["-i", str(inp), "-o", str(out)])
    return out.read_text()


@pytest.mark.parametrize("seed,n_records,max_anchors", [
    (3, 10, 100),
    (4, 20, 400),
])
def test_fast_chain_matches_reference(fastchain_ref, tmp_path, seed,
                                      n_records, max_anchors):
    rng = np.random.default_rng(seed)
    text = gen_chain_input(rng, n_records=n_records, max_anchors=max_anchors)
    ref_out = run_ref(fastchain_ref, text, tmp_path)
    our_out = run_ours(text, tmp_path)
    assert our_out == ref_out
