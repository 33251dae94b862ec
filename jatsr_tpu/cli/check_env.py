"""CLI: environment probe (the reference's check_dependencies.py).

Import-probes the framework's dependency set, reports versions, and checks
accelerator availability + the native loader build.
"""

from __future__ import annotations

import importlib
import importlib.util


def main(argv=None):
    deps = [
        ("jax", True), ("jaxlib", True), ("flax", True), ("optax", True),
        ("orbax.checkpoint", True), ("numpy", True), ("scipy", True),
        ("chex", False), ("einops", False), ("tensorboardX", False),
        ("matplotlib", False), ("torch", False),  # torch: DAC weight convert
    ]
    print("=" * 60)
    print("jatsr_tpu environment check")
    print("=" * 60)
    missing_required = []
    for name, required in deps:
        spec = importlib.util.find_spec(name.split(".")[0])
        if spec is None:
            tag = "REQUIRED-MISSING" if required else "optional-missing"
            if required:
                missing_required.append(name)
            print(f"  [{tag:>16s}] {name}")
            continue
        try:
            mod = importlib.import_module(name)
            ver = getattr(mod, "__version__", "?")
            print(f"  [{'ok':>16s}] {name} {ver}")
        except Exception as e:
            print(f"  [{'import-error':>16s}] {name}: {e}")
            if required:
                missing_required.append(name)

    import jax

    print(f"  backend: {jax.default_backend()}, devices: {jax.devices()}")

    from ..data.native_loader import build_error, is_available

    if is_available():
        print("  native latent loader: built")
    else:
        print(f"  native latent loader: unavailable ({build_error()})")

    if missing_required:
        print(f"MISSING required deps: {missing_required}")
        raise SystemExit(1)
    print("environment OK")


if __name__ == "__main__":
    main()
