"""Environment report (analog of python/sglang/check_env.py).

    python -m iaas_sglang_tpu.check_env
"""

from __future__ import annotations

import importlib
import platform
import sys


def main() -> None:
    print(f"python: {sys.version.split()[0]}  platform: {platform.platform()}")
    for mod in ("jax", "jaxlib", "flax", "optax", "numpy", "transformers",
                "safetensors", "aiohttp", "zmq", "pydantic",
                "prometheus_client", "ml_dtypes"):
        try:
            m = importlib.import_module(mod)
            print(f"{mod}: {getattr(m, '__version__', '?')}")
        except ImportError:
            print(f"{mod}: NOT INSTALLED")
    try:
        import jax

        devs = jax.devices()
        print(f"jax backend: {jax.default_backend()}  devices: {devs}")
        for d in devs[:1]:
            stats = d.memory_stats()
            if stats:
                print(f"  hbm limit: {stats.get('bytes_limit', 0)/1e9:.1f} GB")
            else:
                print("  memory_stats unavailable on this platform")
    except Exception as e:  # noqa: BLE001
        print(f"jax devices unavailable: {e!r}")
    from iaas_sglang_tpu.version import __version__

    print(f"iaas_sglang_tpu: {__version__}")


if __name__ == "__main__":
    main()
