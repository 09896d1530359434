from eigenkernel_tpu.parallel.mesh import (
    layout_grid,
    make_mesh,
    single_device_mesh,
    mat_sharding,
    mat_spec,
    replicated_sharding,
    colvec_sharding,
    distribute,
    gather,
    padded_dim,
    print_grid_mapping,
)

__all__ = [
    "layout_grid",
    "make_mesh",
    "single_device_mesh",
    "mat_sharding",
    "mat_spec",
    "replicated_sharding",
    "colvec_sharding",
    "distribute",
    "gather",
    "padded_dim",
    "print_grid_mapping",
]
