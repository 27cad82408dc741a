from setuptools import find_packages, setup

setup(
    name="slowfast_tpu",
    version="0.1.0",
    description="TPU-native video understanding framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests", "configs")),
    python_requires=">=3.10",
)
