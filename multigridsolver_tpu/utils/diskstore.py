"""Tiny persisted JSON dict for autotune/ladder stores.

Lives next to the XLA compile cache (MGS_CACHE_DIR override honoured)
so everything a repeat run needs — compiled binaries, tuned window
widths, recorded setup/hierarchy structure — shares one location and
one lifecycle.  Writes are atomic (tmp + rename); any read error just
yields an empty store (the records are rebuilt on the next blocking
run)."""
from __future__ import annotations

import json
import os


class JsonStore:
    def __init__(self, filename: str):
        self._filename = filename
        self._data: dict | None = None

    def _path(self) -> str:
        base = os.environ.get("MGS_CACHE_DIR") or "~/.cache/jaxcache_tpu"
        return os.path.expanduser(base) + "/" + self._filename

    def data(self) -> dict:
        if self._data is None:
            self._data = {}
            # shipped warm set first, live cache second (live wins):
            # records are matrix-determined, so fresh machines start
            # with the standard benchmark family's structure known
            ship = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "data", "warmset",
                self._filename)
            if os.environ.get("MGS_NO_WARMSET") == "1":
                ship = ""
            for path in (ship, self._path()):
                try:
                    with open(path) as f:
                        self._data.update(json.load(f))
                except (OSError, ValueError):
                    pass
        return self._data

    def get(self, key: str):
        return self.data().get(key)

    def put(self, key: str, value) -> None:
        self.data()[key] = value
        self.save()

    def save(self) -> None:
        path = self._path()
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(self._data or {}, f)
            os.replace(tmp, path)
        except OSError:
            pass
