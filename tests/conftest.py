"""Test config: run on a virtual 8-device CPU mesh (no TPU dependency).

Environment must be set before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session default (axon TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Reference implementation (oracle for golden tests); optional.
REFERENCE_PATH = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_PATH, "lensless"))


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)
