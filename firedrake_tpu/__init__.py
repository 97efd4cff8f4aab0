"""firedrake_tpu: a TPU-native finite element framework.

A ground-up rebuild of the capabilities of Firedrake
(firedrakeproject/firedrake) on JAX/XLA/Pallas: symbolic weak forms are
compiled to jitted gather -> quadrature-kernel -> scatter XLA programs;
linear/nonlinear solves run as JAX-native Krylov/Newton loops on device;
distribution uses jax.sharding meshes instead of MPI.

Public API mirrors firedrake/__init__.py:59-171 (the demo scripts port
with an import swap).
"""
import os

import jax as _jax

# f64 by default: the reference's solver stack is double precision and the
# regression gates (residuals to 1e-10) require it.  Opt out with
# FIREDRAKE_TPU_X64=0 for bf16/f32 experimentation.
if os.environ.get("FIREDRAKE_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

from .language import *            # noqa: F401,F403  (UFL surface)
from .language import __all__ as _lang_all

from .mesh.utility import *        # noqa: F401,F403
from .mesh.utility import __all__ as _mesh_all
from .vertexonly import VertexOnlyMesh
from .mesh.geometry import Mesh as _MeshClass
from .mesh.topology import MeshTopology

from .functionspace import (FunctionSpace, VectorFunctionSpace,
                            TensorFunctionSpace,
                            RestrictedFunctionSpace)
from .mixed import MixedFunctionSpace
from .function import Function, Cofunction, Constant, MixedFunction
from .bcs import DirichletBC, EquationBC, homogenize
from .assemble import assemble, get_assembler
from .interpolation import interpolate, Interpolator
from .projection import project, Projector
from .norms import norm, errornorm
from .nullspace import VectorSpaceBasis, MixedVectorSpaceBasis
from .io import (VTKFile, File, CheckpointFile, DumbCheckpoint,
                 FILE_CREATE, FILE_READ, FILE_UPDATE)
from .parloops import par_loop, READ, WRITE, RW, INC, MIN, MAX
from .ensemble import (Ensemble, EnsembleFunction, EnsembleFunctionSpace,
                       ensemble_solve, ensemble_batched_solve)
from .pointeval import PointNotInDomainError
from .deflation import Deflation, DeflatedSNES
from .slate import (Tensor, AssembledVector, assemble_slate,
                    DiagonalTensor, Reciprocal, Factorization)
from .elements.tensor_product import (FiniteElement, EnrichedElement,
                                      TensorProductElement, HDiv)
from .elements.finite_element import BrokenElement
from math import pi

#: the reference's label for untagged facets (firedrake/mesh.py:87);
#: dS(UNMARKED)/ds(UNMARKED) select facets with no marker
UNMARKED = -1
from . import fml
from .slope_limiter import VertexBasedLimiter
from .eigensolver import LinearEigenproblem, LinearEigensolver
from .randomfunctiongen import Generator as RandomGenerator, PCG64
from .utils.parameters import parameters, Parameters
from .utils.logging import (set_log_level, info, warning, error, debug,
                            info_red, info_blue, info_green,
                            DEBUG, INFO, WARNING, ERROR, CRITICAL)
from .utils.profiling import (timed_region, timed_function,
                              print_event_summary, write_flamegraph)
from .utils.ux import ProgressBar, Citations
from .adapt import refine_marked, adapt
from .language.external import point_expr, PointwiseOperator
from .supermesh import assemble_mixed_mass_matrix
from .mg.adaptive import AdaptiveMeshHierarchy
from .mg.mesh import (MeshHierarchy, HierarchyBase,
                      NonNestedHierarchy,
                      ExtrudedMeshHierarchy,
                      SemiCoarsenedExtrudedHierarchy)
from .mg.geometry import (GeometryProjectedMeshHierarchy,
                          OpenCascadeMeshHierarchy)
from .mg.transfer import prolong, restrict, inject, TransferManager
from .solvers.snes import AuxiliaryOperatorSNES
from .solvers.pcs import (PCBase, AssembledPC, AuxiliaryOperatorPC,
                          MassInvPC, PCDPC)
from .solving import (solve, LinearVariationalProblem,
                      LinearVariationalSolver,
                      NonlinearVariationalProblem,
                      NonlinearVariationalSolver, LinearSolver)


def Mesh(arg, name=None, **kwargs):
    """Mesh factory (reference: firedrake/mesh.py:3275): pass a mesh
    object, a vector coordinate Function (curved / higher-order
    geometry), or a mesh file path — gmsh .msh (ASCII v2.2/v4.1),
    Exodus II .e/.exo, or CGNS .cgns (reference reads all three via
    DMPlex, firedrake/mesh.py:376-461)."""
    if isinstance(arg, _MeshClass):
        return arg
    if isinstance(arg, Function):
        from .mesh.geometry import make_mesh_from_coordinates
        return make_mesh_from_coordinates(arg, name=name)
    if isinstance(arg, str):
        if arg.endswith(".msh"):
            from .mesh.io_msh import read_msh
            return read_msh(arg, name=name)
        if arg.endswith((".e", ".exo", ".exo2", ".gen")):
            from .mesh.io_exodus import read_exodus
            return read_exodus(arg, name=name)
        if arg.endswith(".cgns"):
            from .mesh.io_cgns import read_cgns
            return read_cgns(arg, name=name)
        raise NotImplementedError(
            f"mesh format of {arg!r} (.msh/.exo/.cgns supported)")
    if hasattr(arg, "Coordinates") and (hasattr(arg, "Elements2D")
                                        or hasattr(arg, "Elements3D")):
        # netgen/NGSolve mesh (reference: firedrake/netgen.py)
        from .netgen_mesh import mesh_from_netgen
        return mesh_from_netgen(arg, name=name or "netgenmesh")
    raise TypeError(type(arg))


__version__ = "0.1.0"

__all__ = (list(_lang_all) + list(_mesh_all) + [
    "FunctionSpace", "VectorFunctionSpace", "TensorFunctionSpace",
    "RestrictedFunctionSpace",
    "MixedFunctionSpace", "MixedFunction",
    "Function", "Cofunction", "Constant", "DirichletBC", "EquationBC",
    "homogenize",
    "assemble", "interpolate", "Interpolator", "project", "Projector",
    "PCBase", "AssembledPC", "AuxiliaryOperatorPC", "MassInvPC", "PCDPC",
    "AuxiliaryOperatorSNES",
    "norm", "errornorm", "solve", "VectorSpaceBasis",
    "VTKFile", "File", "CheckpointFile", "DumbCheckpoint",
    "FILE_CREATE", "FILE_READ", "FILE_UPDATE",
    "par_loop", "READ", "WRITE", "RW", "INC", "MIN", "MAX",
    "Ensemble", "EnsembleFunction", "EnsembleFunctionSpace",
    "PointNotInDomainError", "Deflation", "DeflatedSNES",
    "Tensor", "AssembledVector",
    "assemble_slate", "DiagonalTensor", "Reciprocal", "Factorization",
    "FiniteElement", "TensorProductElement", "HDiv",
    "EnrichedElement", "BrokenElement", "UNMARKED", "pi",
    "VertexOnlyMesh", "refine_marked", "adapt",
    "point_expr", "PointwiseOperator", "assemble_mixed_mass_matrix",
    "VertexBasedLimiter", "LinearEigenproblem", "LinearEigensolver",
    "RandomGenerator", "PCG64", "parameters", "Parameters",
    "set_log_level", "info", "warning", "error", "debug",
    "timed_region", "timed_function", "print_event_summary",
    "write_flamegraph", "ProgressBar", "Citations",
    "MixedVectorSpaceBasis",
    "LinearVariationalProblem", "LinearVariationalSolver",
    "NonlinearVariationalProblem", "NonlinearVariationalSolver",
    "LinearSolver", "Mesh", "MeshTopology",
    "MeshHierarchy", "HierarchyBase", "ExtrudedMeshHierarchy",
    "GeometryProjectedMeshHierarchy", "OpenCascadeMeshHierarchy",
    "NonNestedHierarchy",
    "AdaptiveMeshHierarchy",
    "SemiCoarsenedExtrudedHierarchy", "prolong", "restrict", "inject",
    "TransferManager",
])
