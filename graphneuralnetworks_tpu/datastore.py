"""DataStore: validated dict-of-arrays feature container.

Reference parity: GNNGraphs/src/datastore.jl:59-200 — a dict of feature
arrays with an enforced shared leading dimension ``n`` (the reference uses
the trailing dim; we are features-last), attribute and index access, ``map``
over features, ``getobs`` by int/vector/mask, and concatenation.

Inside ``GraphTuple`` features are plain dicts (pytree-friendliest); this
class is the user-facing constructor/validator that converts to/from them.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

import jax
import numpy as np

__all__ = ["DataStore"]


class DataStore(Mapping):
    """dict-of-arrays with enforced leading dimension.

    >>> ds = DataStore(x=np.ones((5, 3)), y=np.zeros(5))
    >>> ds.n, ds.x.shape
    (5, (5, 3))
    """

    def __init__(self, n: int | None = None, _data=None, **feats):
        data = dict(_data or {})
        data.update(feats)
        self._data = {}
        self._n = n
        for k, v in data.items():
            self._set(k, v)

    # -- core dict protocol --------------------------------------------------
    def __getitem__(self, k):
        return self._data[k]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __getattr__(self, k):
        try:
            return self._data[k]
        except KeyError:
            raise AttributeError(k) from None

    @property
    def n(self) -> int | None:
        return self._n

    def _set(self, k, v):
        if not hasattr(v, "shape"):
            v = np.asarray(v)
        if v.ndim == 0:
            raise ValueError(f"feature {k!r} must have a leading dim")
        if self._n is None:
            self._n = int(v.shape[0])
        elif v.shape[0] != self._n:
            raise ValueError(
                f"feature {k!r} leading dim {v.shape[0]} != n={self._n} "
                "(datastore.jl:59-106 invariant)")
        self._data[k] = v

    # -- reference surface ---------------------------------------------------
    def getdata(self) -> dict:
        """The raw dict (reference ``getdata``)."""
        return dict(self._data)

    def getn(self) -> int | None:
        return self._n

    def map(self, fn: Callable) -> "DataStore":
        """Apply ``fn`` to every feature (datastore.jl ``map``)."""
        return DataStore(_data={k: fn(v) for k, v in self._data.items()})

    def getobs(self, idx) -> "DataStore":
        """Index observations by int / array / boolean mask."""
        def take(v):
            return v[idx]
        out = {k: take(v) for k, v in self._data.items()}
        return DataStore(_data=out)

    @staticmethod
    def cat(stores: list["DataStore"]) -> "DataStore":
        """Concatenate along the observation axis (``cat_features``)."""
        keys = set().union(*[set(s) for s in stores])
        out = {}
        for k in keys:
            parts = [s[k] for s in stores if k in s]
            if len(parts) != len(stores):
                raise ValueError(f"feature {k!r} missing in some stores")
            out[k] = (np.concatenate([np.asarray(p) for p in parts])
                      if isinstance(parts[0], np.ndarray)
                      else jax.numpy.concatenate(parts))
        return DataStore(_data=out)

    def __repr__(self):
        inner = ", ".join(f"{k}: {tuple(v.shape)}"
                          for k, v in self._data.items())
        return f"DataStore(n={self._n}, {inner})"
