from .multichain import make_device_mesh, run_sharded_hmc  # noqa: F401
