"""Real-robot data ingestion.

Replaces `scripts/extract_real.py` + `read_bag/read_bag1.py`:
`real_to_tensor` loads the npy-of-dicts format the reference's rosbag reader
produces (each entry a dict with an 'obs' array; first 27 entries are the
proprioceptive observation — extract_real.py:38-50), and
`categorize_data_by_cmd` buckets observations by their trailing command
triple (GAN.py:48-58).  `read_rosbag` converts a live rosbag the same way
when the `rosbag` package exists (it is not part of this image; the npy
path is the portable format).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Tuple

import numpy as np


def real_to_tensor(real_data_file: str) -> np.ndarray:
    """npy of dicts -> (N, 1, 27) float32 array (extract_real.py:38-50)."""
    real_data = np.load(real_data_file, allow_pickle=True)
    rows = [np.asarray(entry["obs"][:27], np.float32) for entry in real_data]
    return np.stack(rows)[:, None, :]


def categorize_data_by_cmd(data: np.ndarray
                           ) -> Dict[Tuple[float, ...], np.ndarray]:
    """Bucket observations by their trailing 3-d command (GAN.py:48-58)."""
    buckets = defaultdict(list)
    for obs in data:
        cmd = tuple(np.round(np.asarray(obs[0, -3:], np.float64), 6).tolist())
        buckets[cmd].append(obs)
    return {k: np.stack(v) for k, v in buckets.items()}


def read_rosbag(bag_path: str, topic: str = "/obs_topic",
                out_npy: str | None = None) -> np.ndarray:
    """rosbag -> npy-of-dicts (read_bag/read_bag1.py:15-44 equivalent)."""
    try:
        import rosbag  # type: ignore
    except ImportError as e:  # pragma: no cover - rosbag not in image
        raise ImportError(
            "rosbag is not installed; convert the bag offline to the "
            "npy-of-dicts format and use real_to_tensor()") from e
    entries = []
    with rosbag.Bag(bag_path) as bag:  # pragma: no cover
        for _topic, msg, _t in bag.read_messages(topics=[topic]):
            entries.append({"obs": np.asarray(msg.data, np.float32)})
    arr = np.asarray(entries, dtype=object)
    if out_npy:
        np.save(out_npy, arr)
    return arr
