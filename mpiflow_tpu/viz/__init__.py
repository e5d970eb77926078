from mpiflow_tpu.viz.flow_viz import flow_to_color, flow_to_color_jax
from mpiflow_tpu.viz.montage import draw_flow_arrows, vis_flow_pair

__all__ = ["flow_to_color", "flow_to_color_jax", "draw_flow_arrows",
           "vis_flow_pair"]
