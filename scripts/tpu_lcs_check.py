#!/usr/bin/env python
"""Real-TPU parity + throughput of the Pallas LCS kernel at fam10k scale.

Times the full N x N sweep in row blocks (the SLINK/UPGMA access pattern)
and checks a few rows against the scalar reference.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), file=sys.stderr)

from famsa_tpu.core.io_service import load_fasta_records
from famsa_tpu.core.sequence import Sequence
from famsa_tpu.ops.lcs import build_bit_masks, lcs_ref_vs_queries
from famsa_tpu.ops.lcs_pallas import _pick_ql, lcs_rows, pack_query_table

FASTA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fam10k.fasta"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 256
NROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 0   # 0 = full sweep

records = load_fasta_records(FASTA)
seqs = [Sequence(h, s, i) for i, (h, s) in enumerate(records)]
n = len(seqs)
lmax = max(s.data_size for s in seqs)
padded = np.full((n, lmax), 22, dtype=np.int8)
for k, s in enumerate(seqs):
    padded[k, :len(s.data)] = s.data
print(f"{n} seqs, lmax={lmax}", file=sys.stderr)

w = (lmax + 31) // 32
ql = _pick_ql(w)
t0 = time.perf_counter()
tab, w2, nb = pack_query_table(padded, ql)
table_dev = jnp.asarray(tab)
jax.block_until_ready(table_dev)
print(f"table pack+upload ({tab.nbytes/1e6:.0f} MB): "
      f"{time.perf_counter()-t0:.2f} s  w={w} ql={ql} nb={nb}",
      file=sys.stderr)

# compile
t0 = time.perf_counter()
out = lcs_rows(table_dev, padded[:R].astype(np.int32), w, ql, n)
print(f"compile+first block: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

# parity on a few rows
for r in (0, 1, n // 2 % R, R - 1):
    s = seqs[r]
    masks = build_bit_masks(s.data, s.data_size)
    want = lcs_ref_vs_queries(masks, padded)
    np.testing.assert_array_equal(out[r], want, err_msg=f"row {r}")
print("PARITY OK", file=sys.stderr)

nrows = NROWS or n
t0 = time.perf_counter()
done = 0
for base in range(0, nrows, R):
    ids = np.arange(base, min(base + R, n))
    syms = padded[ids].astype(np.int32)
    if len(ids) < R:   # pad to the compiled shape
        syms = np.vstack([syms, np.tile(syms[-1:], (R - len(ids), 1))])
    lcs_rows(table_dev, syms, w, ql, n)
    done += len(ids)
dt = time.perf_counter() - t0
cells = done * n
print(f"sweep: {done} rows x {n} in {dt:.2f} s -> "
      f"{cells/dt:.3e} LCS pairs/s ({cells*lmax/dt:.3e} sym-pair cmp/s)",
      file=sys.stderr)
