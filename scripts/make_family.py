#!/usr/bin/env python
"""Generate a synthetic protein family FASTA (LRR-like scale testing).

Deterministic: sequences are derived from a root by point mutations and
indels along a random binary tree, reproducing the length/identity spread
of a real family.  Usage:

    python scripts/make_family.py N mean_len out.fasta [seed]
"""

import sys

import numpy as np

AA = "ARNDCQEGHILKMFPSTWYV"


def main():
    n = int(sys.argv[1])
    mean_len = int(sys.argv[2])
    out = sys.argv[3]
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 42
    rng = np.random.default_rng(seed)

    root = rng.integers(0, 20, size=mean_len)
    seqs = [root]
    while len(seqs) < n:
        parent = seqs[rng.integers(0, len(seqs))]
        child = parent.copy()
        # point mutations (5-15%)
        k = max(1, int(len(child) * rng.uniform(0.05, 0.15)))
        pos = rng.integers(0, len(child), size=k)
        child[pos] = rng.integers(0, 20, size=k)
        # occasional indel
        if rng.random() < 0.5 and len(child) > 30:
            p = rng.integers(0, len(child) - 10)
            ln = int(rng.integers(1, 10))
            if rng.random() < 0.5:
                child = np.delete(child, slice(p, p + ln))
            else:
                child = np.insert(child, p, rng.integers(0, 20, size=ln))
        seqs.append(child)

    with open(out, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">synth_{i}\n")
            txt = "".join(AA[c] for c in s)
            for p in range(0, len(txt), 60):
                f.write(txt[p:p + 60] + "\n")
    print(f"wrote {n} sequences (mean len ~{mean_len}) to {out}")


if __name__ == "__main__":
    main()
