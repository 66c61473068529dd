"""R1CS constraint-system builder (protoboard equivalent).

TPU-native replacement for libsnark gadgetlib1's `protoboard`,
`pb_variable`, `pb_linear_combination` and `r1cs_constraint_system`
(used by the reference at zklaim/zklaim_gadget.cpp:154-360 and
zklaim/snark.cpp:82-87; SURVEY.md §2.6 row 7).

Differences from libsnark, by design:
  - Constraints are built host-side in Python (circuit construction is
    cold-path); the artifacts handed to the device are flat COO arrays
    (row, col, Montgomery-coefficient limbs) per matrix, statically
    padded -- the shape XLA wants for the QAP instance/witness maps
    (segment-sum sparse matvec, see groth16/).
  - Witness generation is a list of per-gadget hooks run in allocation
    order against a flat integer witness vector; gadget hooks are free
    to vectorize internally (numpy) since they only touch the vector.

Variable convention (libsnark-compatible): index 0 is the constant ONE;
indices 1..num_primary are the public (primary) input; the rest are
auxiliary.  A constraint is <A,w> * <B,w> = <C,w>.
"""

from __future__ import annotations

import numpy as np

from ..ff.limbs import NUM_LIMBS, ints_to_limbs
from ..ff.params import R


class LC:
    """Sparse linear combination over Fr: {var_index: coeff}."""

    __slots__ = ("terms",)

    def __init__(self, terms=None):
        self.terms = dict(terms) if terms else {}

    @classmethod
    def of(cls, var: int, coeff: int = 1):
        return cls({var: coeff % R})

    @classmethod
    def const(cls, c: int):
        return cls({0: c % R}) if c % R else cls()

    def __add__(self, o):
        if isinstance(o, int):
            o = LC.const(o)
        t = dict(self.terms)
        for v, c in o.terms.items():
            nc = (t.get(v, 0) + c) % R
            if nc:
                t[v] = nc
            else:
                t.pop(v, None)
        return LC(t)

    def __sub__(self, o):
        if isinstance(o, int):
            o = LC.const(o)
        return self + (o * (R - 1))

    def __mul__(self, k: int):
        k %= R
        if k == 0:
            return LC()
        return LC({v: (c * k) % R for v, c in self.terms.items()})

    __rmul__ = __mul__
    __radd__ = __add__

    def __neg__(self):
        return self * (R - 1)

    def eval(self, w) -> int:
        return sum(c * w[v] for v, c in self.terms.items()) % R


ONE = LC.of(0)
ZERO = LC()


class ConstraintSystem:
    """R1CS builder + witness-hook registry."""

    def __init__(self):
        self.num_vars = 1          # var 0 == ONE
        self.num_primary = 0       # set by mark_primary_end()
        self.constraints: list[tuple[LC, LC, LC]] = []
        self.hooks: list = []      # callables hook(w: list[int]) -> None
        self.annotations: list[str] = []

    # -- allocation -------------------------------------------------------

    def alloc(self, n: int = 1):
        """Allocate n variables; returns first index (or index if n == 1)."""
        first = self.num_vars
        self.num_vars += n
        return first

    def alloc_lc(self):
        return LC.of(self.alloc())

    def mark_primary_end(self):
        """All variables allocated so far (except ONE) are primary inputs."""
        self.num_primary = self.num_vars - 1

    # -- constraints ------------------------------------------------------

    def constrain(self, a: LC, b: LC, c: LC, note: str = ""):
        self.constraints.append((a, b, c))
        self.annotations.append(note)

    def enforce_boolean(self, lc: LC, note: str = "bool"):
        """lc * (1 - lc) = 0."""
        self.constrain(lc, ONE - lc, ZERO, note)

    def enforce_equal(self, a: LC, b: LC, note: str = "eq"):
        """(a - b) * 1 = 0."""
        self.constrain(a - b, ONE, ZERO, note)

    # -- witness ----------------------------------------------------------

    def add_hook(self, fn):
        self.hooks.append(fn)

    def generate_witness(self, init_hook=None) -> list[int]:
        """Run all hooks in order; returns the full assignment [1, ...].

        init_hook, if given, runs first (sets external inputs).
        """
        w = [0] * self.num_vars
        w[0] = 1
        if init_hook is not None:
            init_hook(w)
        for h in self.hooks:
            h(w)
        return w

    def is_satisfied(self, w) -> bool:
        for i, (a, b, c) in enumerate(self.constraints):
            if a.eval(w) * b.eval(w) % R != c.eval(w):
                return False
        return True

    def first_unsatisfied(self, w):
        """Index + annotation of the first failing constraint (debugging)."""
        for i, (a, b, c) in enumerate(self.constraints):
            if a.eval(w) * b.eval(w) % R != c.eval(w):
                return i, self.annotations[i]
        return None

    # -- export for the device (Groth16 setup/prove) ----------------------

    def to_coo(self):
        """Three COO matrices as numpy arrays, rows sorted.

        Returns dict m -> (rows i32, cols i32, coeffs int list) for
        m in 'A','B','C'.  Coefficients are plain ints mod r; the
        Groth16 layer converts to Montgomery limbs / domain as needed.
        """
        out = {}
        for name, k in (("A", 0), ("B", 1), ("C", 2)):
            rows, cols, coeffs = [], [], []
            for i, con in enumerate(self.constraints):
                for v, c in sorted(con[k].terms.items()):
                    rows.append(i)
                    cols.append(v)
                    coeffs.append(c)
            out[name] = (
                np.asarray(rows, dtype=np.int32),
                np.asarray(cols, dtype=np.int32),
                coeffs,
            )
        return out

    @property
    def num_constraints(self):
        return len(self.constraints)
