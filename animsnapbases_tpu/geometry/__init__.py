"""Geometry support layer: mesh queries, mass lumping, differential operators,
geodesic distances, procedural test meshes, and rigid alignment."""

from animsnapbases_tpu.geometry.mesh import (
    unique_edges,
    tet_edges,
    boundary_facets,
    connected_components_labels,
    largest_component_mask,
    filter_reindex,
    vertex_normals,
    decimate_to_face_ratio,
    triangle_areas,
    elements_per_vertex,
    padded_incidence,
    vertex_star_edges,
    build_vertex_stars,
)
from animsnapbases_tpu.geometry.mass import (
    vertex_masses_voronoi,
    vertex_masses_barycentric_tet,
    lumped_mass_normalized,
    tet_element_masses,
    tri_element_masses,
    edge_element_masses,
)
from animsnapbases_tpu.geometry.laplacian import cotan_laplacian
from animsnapbases_tpu.geometry.geodesics import GeodesicDistance
from animsnapbases_tpu.geometry.procrustes import (
    rigid_procrustes,
    align_animation,
)
from animsnapbases_tpu.geometry.procedural import (
    bar_model,
    cloth_model,
    bar_surface_mesh,
)
