import time, numpy as np, jax
from genarchbench_tpu.io.seqpair_io import read_seqpairs
from genarchbench_tpu.kernels import wfa as W
pairs = read_seqpairs('/tmp/bench_wfa_pairs_v2.txt', swap_longer_first=False)
W.wfa_batch(pairs)
t=time.time(); W.wfa_batch(pairs); print('warm total', time.time()-t, flush=True)
# instrument
for name in ('_build_mismatch_table','_wfa_forward','_wfa_backtrace','_pack_bt'):
    orig = getattr(W, name)
    def mk(o, nm):
        acc=[0.0]
        def f(*a, **k):
            t0=time.time(); r=o(*a,**k); jax.block_until_ready(r); acc[0]+=time.time()-t0
            return r
        f.acc=acc
        return f
    setattr(W, name, mk(orig, name))
t0=time.time()
import genarchbench_tpu.kernels.wfa as WW
t=time.time(); W.wfa_batch(pairs); tot=time.time()-t
print('total', tot)
for name in ('_build_mismatch_table','_wfa_forward','_wfa_backtrace','_pack_bt'):
    print(name, getattr(W, name).acc[0], flush=True)
