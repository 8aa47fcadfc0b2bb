"""Bit-exact drand48/lrand48 reproduction for strict-parity runs.

The reference seeds once with srand48(init_randem_seed)
(/root/reference/Interface.cc:337) and then draws from the SAME stream for
weight init (drand48, Interface.cc:1036-1042), epoch chunk-order shuffling and
intra-chunk sample scattering (lrand48 Fisher-Yates, Interface.cc:1044-1055).
Reproducing that stream lets parity tests match the reference's shuffles and
random inits exactly.  Clean (non-parity) runs use jax.random instead.
"""

from __future__ import annotations

import numpy as np

_A = 0x5DEECE66D
_C = 0xB
_MASK = (1 << 48) - 1


class Rand48:
    def __init__(self, seed: int):
        self.srand48(seed)

    def srand48(self, seed: int) -> None:
        # srand48: Xi = (seed << 16) | 0x330E
        self.x = ((int(seed) & 0xFFFFFFFF) << 16) | 0x330E

    def _step(self) -> int:
        self.x = (_A * self.x + _C) & _MASK
        return self.x

    def drand48(self) -> float:
        return self._step() / float(1 << 48)

    def lrand48(self) -> int:
        return self._step() >> 17

    def uniform(self, lo: float, hi: float, n: int) -> np.ndarray:
        """GetRandWeight: vec[i] = drand48()*(max-min)+min (Interface.cc:1036-1042)."""
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            out[i] = self.drand48() * (hi - lo) + lo
        return out.astype(np.float32)

    def shuffle_indices(self, n: int) -> np.ndarray:
        """GetRandIndex semantics (Interface.cc:1044-1055).

        Starts from vec = [0..n-1] and for i in 0..n-2 swaps
        vec[lrand48() % (n-i)] with vec[n-1-i].
        """
        vec = np.arange(n, dtype=np.int64)
        for i in range(n - 1):
            idx = self.lrand48() % (n - i)
            vec[idx], vec[n - 1 - i] = vec[n - 1 - i], vec[idx]
        return vec

    def shuffle_inplace(self, vec: np.ndarray) -> np.ndarray:
        """Same permutation applied to an arbitrary int vector."""
        n = len(vec)
        for i in range(n - 1):
            idx = self.lrand48() % (n - i)
            vec[idx], vec[n - 1 - i] = vec[n - 1 - i], vec[idx]
        return vec
