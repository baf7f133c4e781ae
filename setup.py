from setuptools import find_packages, setup

setup(
    name="active-3d-vision-and-touch-tpu",
    version="0.1.0",
    description=(
        "TPU-native framework for active 3D shape reconstruction from "
        "vision and touch (JAX/XLA/Pallas)"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy", "scipy"],
)
