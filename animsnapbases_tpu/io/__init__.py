"""I/O layer: byte-exact binary interchange formats, mesh file readers/writers,
and the HDF5 animation schema shared with the reference ecosystem."""

from animsnapbases_tpu.io.binfmt import (
    write_components_bin,
    write_components,
    read_components_bin,
    write_points_vector,
    read_points_vector,
    write_vector,
    write_matrix,
    read_matrix_bin,
    write_masses_bin,
    read_masses_bin,
    write_tensor_colmajor,
    read_tensor_colmajor,
    write_sparse_bin,
    read_sparse_bin,
)
from animsnapbases_tpu.io.meshes import (
    load_off,
    save_off,
    load_obj,
    save_obj,
    load_ply,
    load_medit_mesh,
    save_medit_mesh,
    load_mesh_auto,
)
from animsnapbases_tpu.io.h5anim import (
    write_animation_h5,
    read_animation_h5,
    write_components_h5,
    read_components_h5,
)
