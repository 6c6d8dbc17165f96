from .cxxfmt import cxx_float, cxx_int_trunc  # noqa: F401
