"""Hardened per-user /tmp cache roots, shared by the build-once caches
(``plans.training_queries._artifact_dir`` and
``sources.tables.partitioned_events_dir``).

One definition of the squat/symlink defenses (round-7 review: the
events cache re-implemented the root WITHOUT them): a mode-0700 root
named ``<prefix>_<uid>``, the symlink check running AFTER makedirs (a
symlink planted in a check-then-create window necessarily still exists
then — a pre-makedirs-only check was TOCTOU), uid ownership enforced,
and an optional env-var override for multi-tenant hosts or shared
scratch storage on a real cluster.
"""

from __future__ import annotations

import os


def user_cache_root(prefix: str, *, env_var: str | None = None) -> str:
    """Create-or-validate the per-user cache root and return its path.

    Raises ``RuntimeError`` (instead of trusting the path) when the
    root is a symlink or owned by another uid — reading someone else's
    planted bytes is the silent failure this exists to prevent."""
    import stat
    import tempfile

    root = (os.environ.get(env_var) if env_var else None) or os.path.join(
        tempfile.gettempdir(), f"{prefix}_{os.getuid()}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    if stat.S_ISLNK(os.lstat(root).st_mode):
        raise RuntimeError(
            f"cache root {root} is a symlink — refusing to follow it; "
            f"set {env_var or 'the cache dir'} to a private directory")
    st = os.stat(root)
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"cache root {root} is owned by uid {st.st_uid}, not this "
            f"process's uid {os.getuid()} — another user holds the "
            f"path; set {env_var or 'the cache dir'} to a private "
            f"directory")
    os.chmod(root, 0o700)
    return root
