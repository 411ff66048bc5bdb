from setuptools import find_packages, setup

setup(
    name="ep_tpu",
    version="0.1.0",
    description=("TPU-native efficient probing: frozen vision encoders + "
                 "attentive pooling heads on JAX/XLA/Pallas"),
    packages=find_packages(include=["ep_tpu", "ep_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy", "einops"],
)
