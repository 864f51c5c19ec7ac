# coding: utf-8
"""Packaging for the TPU-native DeepVoice3 framework.

Mirrors the reference's packaging surface (reference setup.py:70-106:
console entry points via scripts, extras for optional deps) with a
setuptools build that also ships the native C++ runtime sources
(deepvoice3_pytorch_tpu/native/src) — the shared library is compiled on
first use with the host toolchain, so no build-time compiler is required
to install.
"""

import os

from setuptools import find_packages, setup

version = "0.1.0"

cwd = os.path.dirname(os.path.abspath(__file__))
if os.getenv("DV3_BUILD_VERSION"):
    version = os.getenv("DV3_BUILD_VERSION")

with open(os.path.join(cwd, "README.md"), encoding="utf-8") as f:
    long_description = f.read()

setup(
    name="deepvoice3_pytorch_tpu",
    version=version,
    description="TPU-native (JAX/XLA/Pallas) convolutional text-to-speech "
                "framework implementing DeepVoice3 and DC-TTS (nyanko)",
    long_description=long_description,
    long_description_content_type="text/markdown",
    packages=find_packages(exclude=("tests",)),
    package_data={
        "deepvoice3_pytorch_tpu.native": ["src/*.cc", "src/*.h"],
    },
    include_package_data=True,
    py_modules=["train", "synthesis", "preprocess", "serve",
                "compute_timestamp_ratio", "dump_hparams_to_json",
                "gentle_web_align"],
    install_requires=[
        "numpy",
        "scipy",
        "jax",
    ],
    extras_require={
        "train": ["tensorboardX", "matplotlib", "tqdm"],
        "test": ["pytest", "torch"],
        "jp": ["jaconv"],
    },
    entry_points={
        "console_scripts": [
            "dv3-preprocess = preprocess:main",
            "dv3-train = train:main",
            "dv3-synthesis = synthesis:main",
            "dv3-serve = serve:main",
        ],
    },
    classifiers=[
        "Programming Language :: Python :: 3",
        "Intended Audience :: Science/Research",
        "Topic :: Multimedia :: Sound/Audio :: Speech",
    ],
)
