"""Radix-2 NTT / iNTT over BN254 Fr for TPU.

TPU-native replacement for libfqfft's basic_radix2_domain (the reference
reaches it through libsnark's QAP instance/witness maps; SURVEY.md §2.6
row 4, include path reference zklaim/CMakeLists.txt:68,77).

Design notes (XLA-first):
  - The domain size n = 2^k is static, so the k butterfly stages are
    unrolled at trace time; each stage is ONE batched Montgomery multiply
    of n/2 elements plus an add/sub pair -- no gathers inside stages.
  - Stage geometry is expressed with reshapes: at stage s the array is
    viewed as (n/m, 2, m/2) [DIT, m = 2^(s+1)]; the twiddle vector
    broadcasts over the leading axis.  XLA lowers this to pure
    elementwise work plus layout changes.
  - The input bit-reversal permutation is a single static `take`.
  - Twiddle tables (per-stage powers of omega) are precomputed on the
    host in python ints and shipped as Montgomery-domain limb constants;
    they are baked into the jitted computation as literals.
  - Coset (shifted-domain) transforms premultiply by powers of the Fr
    multiplicative generator g -- one extra batched multiply -- which is
    what Groth16's H-polynomial division needs (Z(g·ω^i) = g^n - 1 is a
    nonzero constant on the coset).

Multi-chip: stages with stride >= n/num_shards touch both shards of a
sharded array; dist/ shards the leading axis and runs the first k - log2(S)
stages locally, exchanging once via all_to_all (see parallel/).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..ff import montgomery as M
from ..ff.limbs import NUM_LIMBS, ints_to_limbs
from ..ff.montgomery import FR
from ..ff.params import FR_GENERATOR, R, ROOT_OF_UNITY, TWO_ADICITY


class NTTDomain:
    """Radix-2 evaluation domain of size n = 2^k over Fr.

    Holds host-side integer constants and device-ready Montgomery limb
    tables.  Instances are cached per size; safe to treat as jit-static.
    """

    def __init__(self, n: int):
        if n & (n - 1) or n == 0:
            raise ValueError("domain size must be a power of two")
        k = n.bit_length() - 1
        if k > TWO_ADICITY:
            raise ValueError("domain too large for Fr two-adicity")
        self.n = n
        self.k = k
        self.omega = pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - k), R)
        self.omega_inv = pow(self.omega, R - 2, R)
        self.n_inv = pow(n, R - 2, R)
        self.shift = FR_GENERATOR          # coset shift g
        self.shift_inv = pow(self.shift, R - 2, R)

        # bit-reversal permutation (static gather indices)
        idx = np.arange(n, dtype=np.int32)
        rev = np.zeros(n, dtype=np.int32)
        for b in range(k):
            rev |= ((idx >> b) & 1) << (k - 1 - b)
        self.bitrev = rev

        # per-stage twiddles, Montgomery domain: stage s has m = 2^(s+1),
        # needs omega_m^j for j in [0, m/2)
        def mont(vals):
            return ints_to_limbs([v * (1 << 256) % R for v in vals])

        self.stage_tw = []
        self.stage_tw_inv = []
        for s in range(k):
            m = 1 << (s + 1)
            wm = pow(self.omega, n // m, R)
            wmi = pow(self.omega_inv, n // m, R)
            tw = [1]
            twi = [1]
            for _ in range(m // 2 - 1):
                tw.append(tw[-1] * wm % R)
                twi.append(twi[-1] * wmi % R)
            self.stage_tw.append(mont(tw))
            self.stage_tw_inv.append(mont(twi))

        # coset premultipliers g^i and their inverses; n^{-1} scalar
        pw, pwi = [1], [1]
        for _ in range(n - 1):
            pw.append(pw[-1] * self.shift % R)
            pwi.append(pwi[-1] * self.shift_inv % R)
        self.shift_pows = mont(pw)
        self.shift_pows_inv = mont(pwi)
        self.n_inv_mont = mont([self.n_inv])[0]
        # Z_H(g) = g^n - 1 on the coset (constant), and its inverse
        zg = (pow(self.shift, n, R) - 1) % R
        self.z_coset_inv_mont = mont([pow(zg, R - 2, R)])[0]

    # -- device transforms ------------------------------------------------
    #
    # All transforms act along axis 0 and broadcast over any extra axes
    # between the transform axis and the trailing limb axis, i.e. input
    # shape (n, ..., 16) -- the batched form the distributed four-step
    # NTT needs (parallel/ntt.py).
    #
    # Twiddle tables: every transform takes an optional `tables=` pytree
    # (from device_tables()) so jitted callers can pass them as REAL
    # ARGUMENTS.  Closed-over constants -- numpy or device arrays alike
    # (verified on jax 0.9) -- are inlined into the HLO as literals:
    # ~270 MB of program text at n = 2^22, which the tunneled compile
    # service rejects outright (HTTP 413).  The default (tables=None)
    # falls back to inlined literals, which is fine for small domains
    # and standalone tests.

    def _dev(self, name: str):
        cache = self.__dict__.setdefault("_dev_cache", {})
        if name not in cache:
            val = getattr(self, name)
            if isinstance(val, list):
                conv = [jnp.asarray(v) for v in val]
                leaves = conv
            else:
                conv = jnp.asarray(val)
                leaves = [conv]
            # inside a jit/shard_map trace jnp.asarray yields TRACERS;
            # caching one would leak it into later calls (measured: the
            # driver dryrun's intt_t crashed on the tracer cached by the
            # preceding ntt_t trace).  Only memoize concrete arrays.
            if any(isinstance(l, jax.core.Tracer) for l in leaves):
                return conv
            cache[name] = conv
        return cache[name]

    def _butterflies(self, x, tables):
        n = self.n
        rest = x.shape[1:-1]
        ones = (1,) * len(rest)
        for s in range(self.k):
            m = 1 << (s + 1)
            tw = tables[s]                                   # (m/2, 16)
            tw = tw.reshape((m // 2,) + ones + (NUM_LIMBS,))
            v = x.reshape((n // m, 2, m // 2) + rest + (NUM_LIMBS,))
            a, b = v[:, 0], v[:, 1]
            t = M.mont_mul(FR, b, tw)
            x = jnp.stack([M.add_mod(FR, a, t), M.sub_mod(FR, a, t)], axis=1)
            x = x.reshape((n,) + rest + (NUM_LIMBS,))
        return x

    def device_tables(self):
        """All device-resident tables as one pytree, for passing through
        a jit boundary as arguments (see class comment)."""
        return {
            "bitrev": self._dev("bitrev"),
            "tw": tuple(self._dev("stage_tw")),
            "tw_inv": tuple(self._dev("stage_tw_inv")),
            "n_inv": self._dev("n_inv_mont"),
            "shift": self._dev("shift_pows"),
            "shift_inv": self._dev("shift_pows_inv"),
            "z_coset_inv": self._dev("z_coset_inv_mont"),
        }

    def _pallas_ok(self, x) -> bool:
        """Route 2-D (n, 16) transforms through the fused Pallas stages
        on TPU (ntt/pallas_ntt.py: XLA butterflies measured 410 ns/elem
        vs <8 for the fused kernel)."""
        from . import pallas_ntt as PN

        return x.ndim == 2 and PN._eligible(self.n) and PN.use_pallas()

    def ntt(self, x, tables=None):
        """Coefficients -> evaluations on <omega>.  x: (n, ..., 16) mont."""
        t = tables if tables is not None else self.device_tables()
        if self._pallas_ok(x):
            from . import pallas_ntt as PN

            return PN.ntt_aos(self, x, t, inverse=False)
        x = jnp.take(x, t["bitrev"], axis=0)
        return self._butterflies(x, t["tw"])

    def intt(self, y, tables=None):
        """Evaluations on <omega> -> coefficients."""
        t = tables if tables is not None else self.device_tables()
        if self._pallas_ok(y):
            from . import pallas_ntt as PN

            return PN.ntt_aos(self, y, t, inverse=True)
        y = jnp.take(y, t["bitrev"], axis=0)
        out = self._butterflies(y, t["tw_inv"])
        return M.mont_mul(FR, out, t["n_inv"])

    def _bshape(self, x):
        return (self.n,) + (1,) * (x.ndim - 2) + (NUM_LIMBS,)

    def coset_ntt(self, x, tables=None):
        """Coefficients -> evaluations on g·<omega>."""
        t = tables if tables is not None else self.device_tables()
        x = (M.mont_mul_bulk(FR, x, t["shift"]) if x.ndim == 2 else
             M.mont_mul(FR, x, t["shift"].reshape(self._bshape(x))))
        return self.ntt(x, t)

    def coset_intt(self, y, tables=None):
        """Evaluations on g·<omega> -> coefficients."""
        t = tables if tables is not None else self.device_tables()
        c = self.intt(y, t)
        return (M.mont_mul_bulk(FR, c, t["shift_inv"]) if c.ndim == 2 else
                M.mont_mul(FR, c, t["shift_inv"].reshape(self._bshape(c))))


@lru_cache(maxsize=None)
def get_domain(n: int) -> NTTDomain:
    return NTTDomain(n)
