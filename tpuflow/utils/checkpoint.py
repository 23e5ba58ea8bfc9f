"""Per-pyramid-level checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5.4); the natural unit
of solver state is the per-level flow (plus occlusion map / dual
variables where applicable).  Multiscale drivers accept a
`level_callback(scale, state_dict)` hook (see
tpuflow.models.common.run_pyramid); these helpers implement the
standard use: dump each level's state to `<dir>/level_<s>.npz` and
resume a crashed/killed run from the last finished level.
"""

import os

import numpy as np


def save_level_checkpoint(directory, scale, **state):
    """Write one pyramid level's solver state as npz (host transfer)."""
    os.makedirs(directory, exist_ok=True)
    np.savez_compressed(os.path.join(directory, f"level_{scale:02d}.npz"),
                        **{k: np.asarray(v) for k, v in state.items()})


def load_level_checkpoint(directory, scale=None):
    """Load a level checkpoint.  With scale=None, loads the FINEST
    (lowest-numbered) level present and returns (scale, state dict);
    otherwise returns the state dict for that scale."""
    if scale is None:
        levels = sorted(f for f in os.listdir(directory)
                        if f.startswith("level_") and f.endswith(".npz"))
        if not levels:
            raise FileNotFoundError(f"no level checkpoints in {directory}")
        path = os.path.join(directory, levels[0])
        scale = int(levels[0][6:8])
        return scale, dict(np.load(path))
    return dict(np.load(os.path.join(directory, f"level_{scale:02d}.npz")))


def checkpoint_callback(directory):
    """A run_pyramid `level_callback` that dumps each level to npz."""
    def cb(scale, state):
        save_level_checkpoint(directory, scale, **state)
    return cb
