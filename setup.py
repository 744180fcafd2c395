from setuptools import find_packages, setup

setup(
    name="svision-tpu",
    version="0.1.0",
    description=("TPU-native structural-variant calling engine with the "
                 "capabilities of SVision (JAX/XLA/Pallas)"),
    packages=find_packages(include=["svision_tpu", "svision_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "optax"],
    entry_points={
        "console_scripts": [
            "svision-tpu = svision_tpu.cli:main",
        ],
    },
    package_data={"svision_tpu.io": ["native/Makefile", "native/*.cc"]},
)
