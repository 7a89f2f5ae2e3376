from focal_tpu.parallel.mesh import MeshPlan, make_mesh_plan, put_replicated  # noqa: F401
