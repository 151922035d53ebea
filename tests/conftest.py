"""Test config: run JAX on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 takeaway).

Note: this environment pre-imports jax at interpreter startup with
JAX_PLATFORMS=axon, so env vars alone are too late — use the runtime config
API (safe because the backend is initialized lazily, on first device use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def tiny_corpus():
    """Small synthetic corpus with distinctive vocabulary per topic."""
    docs = [
        ("machine learning is a subset of artificial intelligence", {"topic": "ml", "chapter": 1}),
        ("neural networks learn hierarchical representations from data", {"topic": "ml", "chapter": 2}),
        ("the solar system contains eight planets orbiting the sun", {"topic": "space", "chapter": 3}),
        ("jupiter is the largest planet in the solar system", {"topic": "space", "chapter": 4}),
        ("photosynthesis converts sunlight into chemical energy in plants", {"topic": "bio", "chapter": 5}),
        ("mitochondria are the powerhouse of the cell", {"topic": "bio", "chapter": 6}),
        ("the stock market fluctuates based on investor sentiment", {"topic": "finance", "chapter": 7}),
        ("compound interest grows savings exponentially over time", {"topic": "finance", "chapter": 8}),
        ("volcanic eruptions reshape the surface of the earth", {"topic": "geo", "chapter": 9}),
        ("tectonic plates drift slowly across the mantle", {"topic": "geo", "chapter": 10}),
        ("deep learning models require large amounts of training data", {"topic": "ml", "chapter": 11}),
        ("saturn has prominent rings made of ice and rock", {"topic": "space", "chapter": 12}),
    ]
    return docs


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
