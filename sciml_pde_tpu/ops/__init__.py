from sciml_pde_tpu.ops.spectral import spectral_conv_2d, spectral_conv_3d

__all__ = ["spectral_conv_2d", "spectral_conv_3d"]
