"""Compatibility shim: the synthetic renderer moved into the package
(sdvo_tpu.dataio.synthetic) so bench.py and examples can use it too."""

from sdvo_tpu.dataio.synthetic import render_plane, render_ridge, smooth_texture  # noqa: F401
