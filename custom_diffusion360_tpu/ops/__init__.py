from .grid_sample import grid_sample_2d
from .sample_pdf import sample_pdf
from .volume_render import render_weights, volume_render
from .attention import dot_product_attention
