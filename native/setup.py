"""Build the native IO extension: python native/setup.py build_ext --inplace
(or use garment4d_tpu.data.native.ensure_built())."""

from setuptools import Extension, setup

setup(
    name="g4d_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "g4d_native",
            sources=["g4d_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ],
)
