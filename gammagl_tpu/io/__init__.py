"""Raw-file readers (reference: gammagl/io/)."""

from gammagl_tpu.io.txt_array import read_txt_array, parse_txt_array
from gammagl_tpu.io.planetoid import read_planetoid_data
from gammagl_tpu.io.npz import read_npz, parse_npz
from gammagl_tpu.io.tu import read_tu_data

__all__ = [
    "read_txt_array",
    "parse_txt_array",
    "read_planetoid_data",
    "read_npz",
    "parse_npz",
    "read_tu_data",
]
