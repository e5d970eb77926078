"""Flow-pair datasets and the training input pipeline.

Host-side numpy replacements for the reference's torch DataLoader stack
(RAFT/core/datasets.py): file-list datasets for the MPI-Flow generator
output, the diverged COCO layout, KITTI, Sintel, FlyingChairs/Things and
HD1K; a stage dispatcher mirroring fetch_dataloader (:213-252); and a
threaded prefetch iterator producing device-ready NHWC batches.
"""
from __future__ import annotations

import os
import glob
import queue
import threading
from typing import List, Optional, Tuple

import numpy as np

from mpiflow_tpu.io.flo import read_flo, read_flow_kitti, read_pfm
from mpiflow_tpu.data.augmentor import FlowAugmentor, SparseFlowAugmentor


def _read_image(path: str) -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(path)).astype(np.uint8)
    if img.ndim == 2:
        img = np.tile(img[..., None], (1, 1, 3))
    return img[..., :3]


def _read_flow_gen(path: str) -> np.ndarray:
    if path.endswith(".flo"):
        return read_flo(path).astype(np.float32)
    if path.endswith(".pfm"):
        f = read_pfm(path).astype(np.float32)
        return f[:, :, :2]
    raise ValueError(path)


class FlowPairDataset:
    """Base dataset: lists of (img1, img2) paths + flow paths.

    Mirrors FlowDataset (RAFT/core/datasets.py:18-99) incl. the `v * ds`
    replication used by mixed-stage schedules.
    """

    def __init__(self, aug_params: Optional[dict] = None, sparse: bool = False,
                 seed: Optional[int] = None):
        self.sparse = sparse
        self.augmentor = None
        if aug_params is not None:
            cls = SparseFlowAugmentor if sparse else FlowAugmentor
            self.augmentor = cls(**aug_params, seed=seed)
        self.flow_list: List[str] = []
        self.image_list: List[Tuple[str, str]] = []
        self.extra_info: List = []

    def __len__(self):
        return len(self.image_list)

    def __rmul__(self, v: int):
        self.flow_list = v * self.flow_list
        self.image_list = v * self.image_list
        return self

    def __add__(self, other: "FlowPairDataset"):
        ds = FlowPairDataset()
        ds.flow_list = self.flow_list + other.flow_list
        ds.image_list = self.image_list + other.image_list
        ds.sparse = self.sparse
        ds.augmentor = self.augmentor or other.augmentor
        return ds

    def __getitem__(self, index: int):
        """Returns (img1 u8 HWC, img2, flow f32 HW2, valid f32 HW)."""
        index = index % len(self.image_list)
        if self.sparse:
            flow, valid = read_flow_kitti(self.flow_list[index])
        else:
            flow = _read_flow_gen(self.flow_list[index])
            valid = None
        img1 = _read_image(self.image_list[index][0])
        img2 = _read_image(self.image_list[index][1])

        if self.augmentor is not None:
            if self.sparse:
                img1, img2, flow, valid = self.augmentor(img1, img2, flow,
                                                         valid)
            else:
                img1, img2, flow = self.augmentor(img1, img2, flow)

        if valid is None:
            valid = ((np.abs(flow[..., 0]) < 1000)
                     & (np.abs(flow[..., 1]) < 1000))
        return img1, img2, flow.astype(np.float32), valid.astype(np.float32)


class MPIFlowPairs(FlowPairDataset):
    """Generator-output layout {src_images,dst_images,flows}
    (RAFT/core/datasets.py:199-211)."""

    def __init__(self, root: str, aug_params=None, seed=None):
        super().__init__(aug_params, sparse=False, seed=seed)
        i1 = sorted(glob.glob(os.path.join(root, "src_images", "*.png")))
        i2 = sorted(glob.glob(os.path.join(root, "dst_images", "*.png")))
        self.image_list = list(zip(i1, i2))
        self.flow_list = sorted(glob.glob(os.path.join(root, "flows", "*.flo")))


class MPIFlowCOCO(FlowPairDataset):
    """The diverged second copy's MPI_COCO layout {image_1,image_2,flo}
    (core/datasets.py:254-279)."""

    def __init__(self, root: str, aug_params=None, seed=None):
        super().__init__(aug_params, sparse=False, seed=seed)
        i1 = sorted(glob.glob(os.path.join(root, "image_1", "*.png")))
        i2 = sorted(glob.glob(os.path.join(root, "image_2", "*.png")))
        self.image_list = list(zip(i1, i2))
        self.flow_list = sorted(glob.glob(os.path.join(root, "flo", "*.flo")))


class MPIFlowMix(FlowPairDataset):
    """Multi-root mix of MPI_COCO-layout datasets with the kitti-padding
    normalization (reference core/datasets.py:165-251 MPI_COCO_MIX)."""

    def __init__(self, roots, aug_params=None, seed=None):
        super().__init__(aug_params, sparse=False, seed=seed)
        for root in roots:
            i1 = sorted(glob.glob(os.path.join(root, "image_1", "*.png")))
            i2 = sorted(glob.glob(os.path.join(root, "image_2", "*.png")))
            fl = sorted(glob.glob(os.path.join(root, "flo", "*.flo")))
            if not i1:  # also accept the v2 generator layout
                i1 = sorted(glob.glob(os.path.join(root, "src_images", "*.png")))
                i2 = sorted(glob.glob(os.path.join(root, "dst_images", "*.png")))
                fl = sorted(glob.glob(os.path.join(root, "flows", "*.flo")))
            self.image_list += list(zip(i1, i2))
            self.flow_list += fl


class KITTIPairs(FlowPairDataset):
    """KITTI-2012/2015 sparse flow (RAFT/core/datasets.py:161-177)."""

    def __init__(self, root: str, split: str = "training", aug_params=None,
                 seed=None):
        super().__init__(aug_params, sparse=True, seed=seed)
        root = os.path.join(root, split)
        i1 = sorted(glob.glob(os.path.join(root, "image_2", "*_10.png")))
        i2 = sorted(glob.glob(os.path.join(root, "image_2", "*_11.png")))
        self.image_list = list(zip(i1, i2))
        self.extra_info = [[os.path.basename(p)] for p in i1]
        if split == "training":
            self.flow_list = sorted(
                glob.glob(os.path.join(root, "flow_occ", "*_10.png")))


class KITTI12Pairs(FlowPairDataset):
    """KITTI-2012 (grayscale image_0 layout; reference core/datasets.py:282-298)."""

    def __init__(self, root: str, split: str = "training", aug_params=None,
                 seed=None):
        super().__init__(aug_params, sparse=True, seed=seed)
        root = os.path.join(root, split)
        i1 = sorted(glob.glob(os.path.join(root, "image_0", "*_10.png")))
        i2 = sorted(glob.glob(os.path.join(root, "image_0", "*_11.png")))
        self.image_list = list(zip(i1, i2))
        self.extra_info = [[os.path.basename(p)] for p in i1]
        if split == "training":
            self.flow_list = sorted(
                glob.glob(os.path.join(root, "flow_occ", "*_10.png")))


class SintelPairs(FlowPairDataset):
    """MPI-Sintel (RAFT/core/datasets.py:102-118)."""

    def __init__(self, root: str, split: str = "training",
                 dstype: str = "clean", aug_params=None, seed=None):
        super().__init__(aug_params, sparse=False, seed=seed)
        flow_root = os.path.join(root, split, "flow")
        image_root = os.path.join(root, split, dstype)
        for scene in sorted(os.listdir(image_root)):
            imgs = sorted(glob.glob(os.path.join(image_root, scene, "*.png")))
            for i in range(len(imgs) - 1):
                self.image_list.append((imgs[i], imgs[i + 1]))
                self.extra_info.append((scene, i))
            if split != "test":
                self.flow_list += sorted(
                    glob.glob(os.path.join(flow_root, scene, "*.flo")))


def load_chairs_split(split_file: Optional[str] = None) -> np.ndarray:
    """Official FlyingChairs train/val split flags (1=train, 2=val).

    The reference always loads its bundled chairs_split.txt
    (RAFT/core/datasets.py:124-126); we bundle the same 22,872 flags as a
    packed bitmask asset. A text split file can override it."""
    if split_file is not None:
        if not os.path.exists(split_file):
            raise FileNotFoundError(
                f"chairs split file {split_file!r} not found")
        return np.loadtxt(split_file, dtype=np.int32)
    path = os.path.join(os.path.dirname(__file__), "assets",
                        "chairs_split.bin")
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(4), "little")
        bits = np.unpackbits(np.frombuffer(f.read(), np.uint8))[:n]
    return np.where(bits == 1, 2, 1).astype(np.int32)


class FlyingChairsPairs(FlowPairDataset):
    """(RAFT/core/datasets.py:121-134)."""

    def __init__(self, root: str, split: str = "training", aug_params=None,
                 split_file: Optional[str] = None, seed=None):
        super().__init__(aug_params, sparse=False, seed=seed)
        images = sorted(glob.glob(os.path.join(root, "*.ppm")))
        flows = sorted(glob.glob(os.path.join(root, "*.flo")))
        split_list = load_chairs_split(split_file)
        if len(flows) > len(split_list):
            raise ValueError(
                f"{len(flows)} chairs flows but split has only "
                f"{len(split_list)} entries")
        want = 1 if split == "training" else 2
        for i in range(len(flows)):
            if split_list[i] == want:
                self.flow_list.append(flows[i])
                self.image_list.append((images[2 * i], images[2 * i + 1]))


class HD1KPairs(FlowPairDataset):
    """HD1K sparse flow (RAFT/core/datasets.py:180-196)."""

    def __init__(self, root: str, aug_params=None, seed=None):
        super().__init__(aug_params, sparse=True, seed=seed)
        seq = 0
        while True:
            flows = sorted(glob.glob(os.path.join(
                root, "hd1k_flow_gt", "flow_occ", f"{seq:06d}_*.png")))
            images = sorted(glob.glob(os.path.join(
                root, "hd1k_input", "image_2", f"{seq:06d}_*.png")))
            if not flows:
                break
            for i in range(len(flows) - 1):
                self.flow_list.append(flows[i])
                self.image_list.append((images[i], images[i + 1]))
            seq += 1


class FlyingThingsPairs(FlowPairDataset):
    """FlyingThings3D (RAFT/core/datasets.py:137-158)."""

    def __init__(self, root: str, dstype: str = "frames_cleanpass",
                 aug_params=None, seed=None):
        super().__init__(aug_params, sparse=False, seed=seed)
        for cam in ("left",):
            for direction in ("into_future", "into_past"):
                image_dirs = sorted(glob.glob(os.path.join(root, dstype,
                                                           "TRAIN/*/*")))
                image_dirs = sorted(os.path.join(f, cam) for f in image_dirs)
                flow_dirs = sorted(glob.glob(os.path.join(
                    root, "optical_flow/TRAIN/*/*")))
                flow_dirs = sorted(os.path.join(f, direction, cam)
                                   for f in flow_dirs)
                for idir, fdir in zip(image_dirs, flow_dirs):
                    images = sorted(glob.glob(os.path.join(idir, "*.png")))
                    flows = sorted(glob.glob(os.path.join(fdir, "*.pfm")))
                    for i in range(len(flows) - 1):
                        if direction == "into_future":
                            self.image_list.append((images[i], images[i + 1]))
                            self.flow_list.append(flows[i])
                        else:
                            self.image_list.append((images[i + 1], images[i]))
                            self.flow_list.append(flows[i + 1])


class InMemoryFlowPairs(FlowPairDataset):
    """Ring buffer of generated samples for online training (no disk)."""

    def __init__(self, capacity: int, aug_params=None, seed=None):
        super().__init__(aug_params, sparse=False, seed=seed)
        self.capacity = capacity
        self._img1: List[np.ndarray] = []
        self._img2: List[np.ndarray] = []
        self._flow: List[np.ndarray] = []
        self._cursor = 0
        import threading
        self._lock = threading.Lock()

    def add(self, img1_u8: np.ndarray, img2_u8: np.ndarray,
            flow: np.ndarray) -> None:
        with self._lock:
            if len(self._img1) < self.capacity:
                self._img1.append(img1_u8)
                self._img2.append(img2_u8)
                self._flow.append(flow)
            else:
                i = self._cursor % self.capacity
                self._img1[i] = img1_u8
                self._img2[i] = img2_u8
                self._flow[i] = flow
                self._cursor += 1

    def __len__(self):
        with self._lock:
            return len(self._img1)

    def __getitem__(self, index: int):
        with self._lock:
            n = len(self._img1)
            i = index % n
            img1, img2 = self._img1[i].copy(), self._img2[i].copy()
            flow = self._flow[i].copy()
        if self.augmentor is not None:
            img1, img2, flow = self.augmentor(img1, img2, flow)
        valid = ((np.abs(flow[..., 0]) < 1000)
                 & (np.abs(flow[..., 1]) < 1000))
        return img1, img2, flow.astype(np.float32), valid.astype(np.float32)


def fetch_dataset(stage: str, data_root: str, crop_size,
                  seed: Optional[int] = None) -> FlowPairDataset:
    """Stage -> dataset with the reference aug params
    (RAFT/core/datasets.py:213-252)."""
    if stage == "mpi-flow":
        aug = {"crop_size": crop_size, "min_scale": -0.2, "max_scale": 0.4,
               "do_flip": False}
        return MPIFlowPairs(data_root, aug, seed=seed)
    if stage == "mpi-coco":
        aug = {"crop_size": crop_size, "min_scale": -0.2, "max_scale": 0.4,
               "do_flip": False}
        return MPIFlowCOCO(data_root, aug, seed=seed)
    if stage == "kitti":
        aug = {"crop_size": crop_size, "min_scale": -0.2, "max_scale": 0.4,
               "do_flip": False}
        return KITTIPairs(data_root, "training", aug, seed=seed)
    if stage == "chairs":
        aug = {"crop_size": crop_size, "min_scale": -0.1, "max_scale": 1.0,
               "do_flip": True}
        return FlyingChairsPairs(data_root, "training", aug, seed=seed)
    if stage == "things":
        aug = {"crop_size": crop_size, "min_scale": -0.4, "max_scale": 0.8,
               "do_flip": True}
        return (FlyingThingsPairs(data_root, "frames_cleanpass", aug,
                                  seed=seed)
                + FlyingThingsPairs(data_root, "frames_finalpass", aug,
                                    seed=seed))
    if stage == "sintel":
        # reference sintel stage = a weighted mixture (datasets.py:227-240):
        # 100x clean + 100x final [+ 200x KITTI + 5x HD1K] + Things, with
        # per-dataset aug params. data_root must contain Sintel/ [,
        # FlyingThings3D/, KITTI/, HD1K/] subdirs (the reference hardcodes
        # the same layout under datasets/). Falls back to clean+final when
        # the extra roots are absent.
        aug = {"crop_size": crop_size, "min_scale": -0.2, "max_scale": 0.6,
               "do_flip": True}
        sroot = (os.path.join(data_root, "Sintel")
                 if os.path.isdir(os.path.join(data_root, "Sintel"))
                 else data_root)
        clean = SintelPairs(sroot, "training", "clean", aug, seed=seed)
        final = SintelPairs(sroot, "training", "final", aug, seed=seed)
        ds = 100 * clean + 100 * final
        troot = os.path.join(data_root, "FlyingThings3D")
        if os.path.isdir(troot):
            ds = ds + FlyingThingsPairs(troot, "frames_cleanpass", aug,
                                        seed=seed)
        kroot = os.path.join(data_root, "KITTI")
        if os.path.isdir(kroot):
            kaug = {"crop_size": crop_size, "min_scale": -0.3,
                    "max_scale": 0.5, "do_flip": True}
            ds = ds + 200 * KITTIPairs(kroot, "training", kaug, seed=seed)
        hroot = os.path.join(data_root, "HD1K")
        if os.path.isdir(hroot):
            haug = {"crop_size": crop_size, "min_scale": -0.5,
                    "max_scale": 0.2, "do_flip": True}
            ds = ds + 5 * HD1KPairs(hroot, haug, seed=seed)
        return ds
    raise ValueError(f"unknown stage {stage}")


def make_train_iterator(dataset: FlowPairDataset, batch_size: int,
                        seed: int = 0, num_threads: int = 4,
                        prefetch: int = 4):
    """Infinite shuffled iterator of NHWC batches
    (img1 [B,H,W,3] f32 0..255, img2, flow [B,H,W,2], valid [B,H,W]).

    Replaces the reference's 4-worker torch DataLoader with threads feeding
    a bounded queue; sample RNG is per-thread seeded (the reference seeds
    workers similarly, datasets.py:45-51).
    """
    n = len(dataset)
    if n == 0:
        raise ValueError("empty dataset")
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker(wid: int):
        import copy
        rng = np.random.RandomState(seed * 1000 + wid)
        # per-thread shallow copy with its own augmentor RNG (no shared state)
        ds = copy.copy(dataset)
        if ds.augmentor is not None:
            ds.augmentor = copy.copy(ds.augmentor)
            ds.augmentor.rng = np.random.RandomState(seed * 7777 + wid)
        while not stop.is_set():
            try:
                idx = rng.randint(0, n, size=batch_size)
                b1, b2, bf, bv = [], [], [], []
                for i in idx:
                    i1, i2, f, v = ds[int(i)]
                    b1.append(i1)
                    b2.append(i2)
                    bf.append(f)
                    bv.append(v)
                batch = (np.stack(b1).astype(np.float32),
                         np.stack(b2).astype(np.float32),
                         np.stack(bf), np.stack(bv))
            except Exception as e:  # surface to the consumer, don't die silently
                batch = e
            while not stop.is_set():
                try:
                    q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue
            if isinstance(batch, Exception):
                return

    threads = [threading.Thread(target=worker, args=(i,), daemon=True)
               for i in range(num_threads)]
    for t in threads:
        t.start()

    class _Iter:
        def __iter__(self):
            return self

        def __next__(self):
            item = q.get()
            if isinstance(item, Exception):
                stop.set()
                raise RuntimeError("data worker failed") from item
            return item

        def close(self):
            stop.set()

    return _Iter()
