"""Camera file I/O — the camera.bin equivalent.

The reference exports `camera.bin` (torch.save of [val_cams, train_cams]
pytorch3d PerspectiveCameras lists, main.py:1025-1029) which sample.py reads
to pick reference/target poses. Native format here is a plain .npz with
R/T/focal_length/principal_point/image_size arrays per split; a converter
from the torch file is provided when pytorch3d is importable (it is not part
of this image — run the converter wherever the reference env exists).
"""
from __future__ import annotations

import numpy as np

from ..geometry.cameras import Cameras


def save_cameras_npz(path: str, **splits: Cameras) -> None:
    """save_cameras_npz(p, train=cams_train, val=cams_val)"""
    data = {}
    for name, cams in splits.items():
        for field in Cameras._fields:
            data[f"{name}.{field}"] = np.asarray(getattr(cams, field))
    np.savez(path, **data)


def load_cameras_npz(path: str) -> dict:
    raw = dict(np.load(path))
    splits: dict = {}
    for key, val in raw.items():
        name, field = key.rsplit(".", 1)
        splits.setdefault(name, {})[field] = val
    return {
        name: Cameras(**{f: fields[f] for f in Cameras._fields})
        for name, fields in splits.items()
    }


def convert_camera_bin(path: str) -> dict:
    """Convert the reference's torch camera.bin (requires pytorch3d)."""
    try:
        import torch  # noqa
        import pytorch3d.renderer  # noqa
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Converting camera.bin requires torch+pytorch3d (the reference "
            "environment). Run there:\n"
            "  import torch, numpy as np\n"
            "  val, train = torch.load('camera.bin')\n"
            "  ... save R/T/focal_length/principal_point per split to .npz\n"
            "then load it here with load_cameras_npz."
        ) from e
    import torch

    val, train = torch.load(path, map_location="cpu")

    def convert(cam_list):
        import numpy as np

        return Cameras.create(
            R=np.stack([np.asarray(c.R[0]) for c in cam_list]),
            T=np.stack([np.asarray(c.T[0]) for c in cam_list]),
            focal_length=np.stack([np.asarray(c.focal_length[0]) for c in cam_list]),
            principal_point=np.stack(
                [np.asarray(c.principal_point[0]) for c in cam_list]
            ),
        )

    return {"val": convert(val), "train": convert(train)}
