"""rsparse_tpu — a TPU-native sparse direct-solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of rsparse
(RLado/rsparse v1.2.1, Tim Davis's CSparse in Rust): CSC (`Sprs`) and triplet
(`Trpl`) containers, sparse add/multiply/transpose/gaxpy/norm, dense
triangular solves, and the three A\\b direct solvers — `cholsol` (up-looking
Cholesky), `lusol` (left-looking LU with partial pivoting), `qrsol`
(Householder QR, incl. underdetermined least-squares).

Architecture (SURVEY.md §7):
  - L1' storage: host numpy CSC builders + immutable device pytrees.
  - L2' ops: host symbolic plans + jitted device numeric kernels.
  - L3' symbolic: AMD / etree / postorder / counts / vcount in native C++
    (host, once per pattern) producing device-ready level schedules.
  - L4' factorization: level-scheduled device kernels (batched dense
    triangular solves on the MXU for Cholesky; masked-argmax pivoting for LU).
  - L5' solvers: `cholsol`/`lusol`/`qrsol` drivers with the reference's exact
    signatures (order in {-1,0,1,2}, tol; b overwritten in spirit — we return
    the solution since Python lists aren't mutated through JAX).
  - L6' distributed: row-partitioned kernels over `jax.sharding.Mesh`.
"""

from .config import config, enable_x64

enable_x64()  # f64 parity with the reference's tolerances (down to 1e-12)

from .data import Sprs, Trpl, Symb, Nmrc, CSCDevice  # noqa: E402
from .errors import RsparseError, NotPositiveDefiniteError, NoPivotError  # noqa: E402
from .ops import (  # noqa: E402
    add,
    multiply,
    transpose,
    gaxpy,
    gaxpy_multi,
    norm,
    scpmat,
    scxmat,
    permute,
    symperm,
    ipvec,
    pvec,
    pinvert,
    fkeep,
    sprs_print,
)

__version__ = "0.1.0"

__all__ = [
    "Sprs",
    "Trpl",
    "Symb",
    "Nmrc",
    "CSCDevice",
    "RsparseError",
    "NotPositiveDefiniteError",
    "NoPivotError",
    "add",
    "multiply",
    "transpose",
    "gaxpy",
    "gaxpy_multi",
    "norm",
    "scpmat",
    "scxmat",
    "permute",
    "symperm",
    "ipvec",
    "pvec",
    "pinvert",
    "fkeep",
    "sprs_print",
    "config",
    # solvers are appended below once the modules import
]


from .solve import (  # noqa: E402
    lsolve,
    ltsolve,
    usolve,
    utsolve,
    lsolve_multi,
    ltsolve_multi,
    usolve_multi,
    utsolve_multi,
    cholsol,
    lusol,
    qrsol,
    qrsol_ls,
    cholsol_multi,
    cholsol_vals,
    lusol_vals,
    qrsol_vals,
    lusol_multi,
    qrsol_multi,
    cholsol_ir,
    cholsol_serve,
    lusol_serve,
    qrsol_serve,
)
from .symbolic import schol, sqr  # noqa: E402
from .factor import chol, lu, qr  # noqa: E402
from . import utils  # noqa: E402

__all__ += [
    "lsolve",
    "ltsolve",
    "usolve",
    "utsolve",
    "lsolve_multi",
    "ltsolve_multi",
    "usolve_multi",
    "utsolve_multi",
    "cholsol",
    "lusol",
    "qrsol",
    "qrsol_ls",
    "cholsol_multi",
    "cholsol_vals",
    "lusol_vals",
    "qrsol_vals",
    "lusol_multi",
    "qrsol_multi",
    "cholsol_ir",
    "cholsol_serve",
    "lusol_serve",
    "qrsol_serve",
    "schol",
    "sqr",
    "chol",
    "lu",
    "qr",
]
