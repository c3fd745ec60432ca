"""Multi-chip parallelism: mesh construction + sharded audit step."""
from .mesh import make_mesh, sharded_audit_step, make_sharded_demo_batch

__all__ = ["make_mesh", "sharded_audit_step", "make_sharded_demo_batch"]
