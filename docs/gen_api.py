"""Generate docs/api.md from the package's docstrings.

Run from the repo root:  python docs/gen_api.py
"""

import importlib
import inspect
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

MODULES = [
    "graphneuralnetworks_tpu.graph",
    "graphneuralnetworks_tpu.datastore",
    "graphneuralnetworks_tpu.heterograph",
    "graphneuralnetworks_tpu.temporal",
    "graphneuralnetworks_tpu.generate",
    "graphneuralnetworks_tpu.transform",
    "graphneuralnetworks_tpu.query",
    "graphneuralnetworks_tpu.convert",
    "graphneuralnetworks_tpu.utils",
    "graphneuralnetworks_tpu.sampling",
    "graphneuralnetworks_tpu.device_sampler",
    "graphneuralnetworks_tpu.operators",
    "graphneuralnetworks_tpu.training",
    "graphneuralnetworks_tpu.checkpoint",
    "graphneuralnetworks_tpu.profiling",
    "graphneuralnetworks_tpu.ops.msgpass",
    "graphneuralnetworks_tpu.ops.segment",
    "graphneuralnetworks_tpu.ops.runs",
    "graphneuralnetworks_tpu.ops.attention",
    "graphneuralnetworks_tpu.ops.gutils",
    "graphneuralnetworks_tpu.ops.pallas.spmm",
    "graphneuralnetworks_tpu.ops.pallas.sddmm",
    "graphneuralnetworks_tpu.ops.pallas.gather",
    "graphneuralnetworks_tpu.ops.pallas.edge_softmax",
    "graphneuralnetworks_tpu.models.basic",
    "graphneuralnetworks_tpu.models.conv",
    "graphneuralnetworks_tpu.models.heteroconv",
    "graphneuralnetworks_tpu.models.pool",
    "graphneuralnetworks_tpu.models.temporalconv",
    "graphneuralnetworks_tpu.parallel.partition",
    "graphneuralnetworks_tpu.parallel.shard",
    "graphneuralnetworks_tpu.parallel.shardgraph",
    "graphneuralnetworks_tpu.data.datasets",
    "graphneuralnetworks_tpu.data.loader",
]


def first_para(doc):
    return (doc or "").strip()


def sig_of(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def render() -> str:
    """Render the full api.md content (used by main() and the drift test)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    out = io.StringIO()
    out.write("# API reference\n\n")
    out.write("Generated from docstrings by `docs/gen_api.py`; "
              "regenerate after changing public surfaces.\n")
    for name in MODULES:
        mod = importlib.import_module(name)
        out.write(f"\n## `{name}`\n\n")
        mdoc = (mod.__doc__ or "").strip().splitlines()
        if mdoc:
            out.write(mdoc[0] + "\n")
        public = getattr(mod, "__all__", None)
        if public is None:
            public = [n for n in vars(mod) if not n.startswith("_")]
        for sym in public:
            obj = getattr(mod, sym, None)
            if obj is None:
                continue
            doc = first_para(inspect.getdoc(obj))
            if inspect.isclass(obj):
                out.write(f"\n### class `{sym}`\n\n{doc}\n")
                for mname, m in sorted(vars(obj).items()):
                    if mname.startswith("_") or not callable(m):
                        continue
                    mdoc_ = first_para(inspect.getdoc(m))
                    out.write(f"\n- **`{sym}.{mname}{sig_of(m)}`** — "
                              f"{mdoc_.splitlines()[0] if mdoc_ else ''}\n")
            elif callable(obj):
                out.write(f"\n### `{sym}{sig_of(obj)}`\n\n{doc}\n")
    return out.getvalue()


def main():
    content = render()
    path = os.path.join(os.path.dirname(__file__), "api.md")
    with open(path, "w") as f:
        f.write(content)
    print(f"wrote {path} ({len(content.splitlines())} lines)")


if __name__ == "__main__":
    main()
