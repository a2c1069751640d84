from corrifnet_tpu.run.segplot import segplot, segplot_blackwhite, segplot_indexed

__all__ = ["segplot", "segplot_blackwhite", "segplot_indexed"]
