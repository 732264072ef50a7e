from gnnkeras_tpu.utils.dtypes import floatx, set_floatx

__all__ = ["floatx", "set_floatx"]
