"""Single configuration entry point for the framework (SURVEY §5 config row).

The reference has no config system beyond the `(m, n)` deck split passed to
`setup` (`lib.rs:74-78`), the compile-time curve choice (`tests.rs:16`,
`parameter_selection.rs:25`), and the five Fiat-Shamir seed constants
(`mod.rs:80-84` — those live in `crypto/transcript.py` as protocol
constants). This framework adds runtime knobs (kernel selection, bench
shapes, cache location); they were previously scattered `MPTPU_*` env reads.

`get_config()` is the one accessor: it reads the environment ONCE into a
frozen `RuntimeConfig`; `set_config()` / `override()` replace it for tests.
Env vars remain the backing store so shell-level control keeps working.

`ProtocolConfig` is the per-game configuration (curve, deck split, batch,
mesh) that the reference passes around as loose arguments.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os


def _env_bool(name: str, default: bool | None) -> bool | None:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    return v not in ("0", "false", "False")


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Process-wide runtime knobs (env-backed, read once)."""

    # --- kernel / compile ---
    cache_dir: str | None = None          # MPTPU_CACHE_DIR (None = repo .jax_cache)
    pallas: bool | None = None            # MPTPU_PALLAS: None = auto (TPU only)
    pallas_msm: bool = True               # MPTPU_PALLAS_MSM: lane MSM kernel
    fixed_window_bits: int = 4            # MPTPU_FIXED_WINDOW (bench sets 8)
    fuse_b_max: int = 0                   # MPTPU_FUSE_B: batches <= this run
                                          # the whole prove/verify as ONE
                                          # fused program (latency mode)
    # --- observability ---
    stage_timing: bool = False            # MPTPU_STAGE_TIMING
    profile_dir: str | None = None        # MPTPU_PROFILE (jax.profiler trace dir)
    # --- bench ---
    bench_mode: str = "shuffle52"         # MPTPU_BENCH_MODE
    bench_reps: int = 3                   # MPTPU_BENCH_REPS
    bench_batch: int = 128                # MPTPU_BENCH_BATCH
    bench_smoke: bool = False             # MPTPU_BENCH_SMOKE
    # --- driver dry run ---
    dryrun_budget_s: float = 480.0        # MPTPU_DRYRUN_BUDGET_S
    # --- speed-of-light harness ---
    sol_reps: int = 5                     # MPTPU_SOL_REPS
    sol_batch: int = 1 << 20              # MPTPU_SOL_B

    @classmethod
    def from_env(cls) -> "RuntimeConfig":
        d = cls()
        return cls(
            cache_dir=os.environ.get("MPTPU_CACHE_DIR") or None,
            pallas=_env_bool("MPTPU_PALLAS", None),
            pallas_msm=bool(_env_bool("MPTPU_PALLAS_MSM", True)),
            fixed_window_bits=int(
                os.environ.get("MPTPU_FIXED_WINDOW", d.fixed_window_bits)
            ),
            fuse_b_max=int(os.environ.get("MPTPU_FUSE_B", d.fuse_b_max)),
            stage_timing=bool(_env_bool("MPTPU_STAGE_TIMING", False)),
            profile_dir=os.environ.get("MPTPU_PROFILE") or None,
            bench_mode=os.environ.get("MPTPU_BENCH_MODE", d.bench_mode),
            bench_reps=int(os.environ.get("MPTPU_BENCH_REPS", d.bench_reps)),
            bench_batch=int(os.environ.get("MPTPU_BENCH_BATCH", d.bench_batch)),
            bench_smoke=bool(_env_bool("MPTPU_BENCH_SMOKE", False)),
            dryrun_budget_s=float(
                os.environ.get("MPTPU_DRYRUN_BUDGET_S", d.dryrun_budget_s)
            ),
            sol_reps=int(os.environ.get("MPTPU_SOL_REPS", d.sol_reps)),
            sol_batch=int(os.environ.get("MPTPU_SOL_B", d.sol_batch)),
        )


_config: RuntimeConfig | None = None


def get_config() -> RuntimeConfig:
    global _config
    if _config is None:
        _config = RuntimeConfig.from_env()
    return _config


def set_config(cfg: RuntimeConfig | None) -> None:
    """Replace the process config (None = re-read env on next access)."""
    global _config
    _config = cfg


@contextlib.contextmanager
def override(**kwargs):
    """Temporarily override config fields (tests)."""
    old = get_config()
    set_config(dataclasses.replace(old, **kwargs))
    try:
        yield get_config()
    finally:
        set_config(old)


@dataclasses.dataclass(frozen=True)
class ProtocolConfig:
    """Per-game protocol configuration.

    `m * n` is the deck size; the reference documents the proof-size tradeoff
    at `parameter_selection.rs:1-10` (optimal m ≈ n/3). `batch` is this
    framework's batch-first axis (decks proved per dispatch); `mesh_dp` /
    `mesh_sp` describe the device mesh (parallel/sharding.make_mesh).
    """

    curve: str = "stark"  # "stark" | "bls12_377_g1"
    m: int = 2
    n: int = 26
    batch: int = 1
    mesh_dp: int = 1
    mesh_sp: int = 1

    @property
    def deck_size(self) -> int:
        return self.m * self.n

    def make_curve(self):
        from .ops import curve as curve_mod

        if self.curve == "stark":
            return curve_mod.stark_curve()
        if self.curve in ("bls12_377_g1", "bls377", "bls12-377"):
            return curve_mod.bls12_377_g1()
        raise ValueError(f"unknown curve {self.curve!r}")
