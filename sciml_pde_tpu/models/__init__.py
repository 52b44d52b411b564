from sciml_pde_tpu.models.fno import FNO2d, FNO3d, FNO2dAux, FNO3dAux

__all__ = ["FNO2d", "FNO3d", "FNO2dAux", "FNO3dAux"]
