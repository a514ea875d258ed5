"""API-key auth (operator A19): sha256 lookup + TTL cache; an admin
key may impersonate any destination via ``?destination_id``
(reference ``pkg/api/auth.go:24-55``, cache ``api/api.go:60-71``)."""

from __future__ import annotations

import hashlib
import threading
import time


def hash_key(key: str) -> str:
    return hashlib.sha256(key.encode()).hexdigest()


class KeyStore:
    def __init__(self, keys: dict[str, str], admin_key: str | None = None, cache_ttl: float = 60.0):
        """keys: plaintext api_key -> destination name (stored hashed)."""
        self._hashes = {hash_key(k): dest for k, dest in keys.items()}
        self._admin_hash = hash_key(admin_key) if admin_key else None
        self._cache: dict[str, tuple[float, str | None]] = {}
        self._ttl = cache_ttl
        self._lock = threading.Lock()

    def add_key(self, key: str, destination: str) -> None:
        with self._lock:
            self._hashes[hash_key(key)] = destination
            self._cache.pop(hash_key(key), None)

    def drop_destination(self, destination: str) -> None:
        """Revoke every key for a deleted destination (the reference
        cascades this through its DB foreign key)."""
        with self._lock:
            self._hashes = {
                h: d for h, d in self._hashes.items() if d != destination
            }
            self._cache = {
                h: v for h, v in self._cache.items() if v[1] != destination
            }

    def is_admin(self, api_key: str | None) -> bool:
        return (
            bool(api_key)
            and self._admin_hash is not None
            and hash_key(api_key) == self._admin_hash
        )

    def resolve(self, api_key: str | None, destination_id: str | None = None) -> str | None:
        """→ destination name, or None if unauthorized."""
        if not api_key:
            return None
        h = hash_key(api_key)
        if self._admin_hash and h == self._admin_hash:
            return destination_id or "default"
        with self._lock:
            hit = self._cache.get(h)
            if hit and hit[0] > time.time():
                return hit[1]
            dest = self._hashes.get(h)
            self._cache[h] = (time.time() + self._ttl, dest)
            return dest
