"""Atlas checkpoint/resume.

Replaces the reference's boost-serialization `.osa` session files
(System::SaveAtlas/LoadAtlas, /root/reference/src/System.cc:1014-1098;
object-graph serializers in Atlas.h/Map.h/KeyFrame.h/MapPoint.h): the pointer
web is flattened to id-keyed plain structures and written as a DATA-SHAPED
npz archive — a JSON structure string plus numbered numpy arrays, loaded with
allow_pickle=False so restoring a checkpoint never executes code from the
file (the boost text/binary archives of the reference are similarly
data-only). Static id counters are saved too (Atlas.h:56-61).
"""
from __future__ import annotations

import io
import json

import numpy as np

from .map import Atlas, KeyFrame, Map, MapPoint


# --- JSON + npz hybrid codec -------------------------------------------------
# Nested dict/list structures of plain scalars serialize as JSON; numpy
# arrays are pulled out into numbered npz members and referenced by index.
# Dicts with non-string keys (obs: kf_id -> slot, covis: kf_id -> weight)
# are encoded as explicit pair lists.


def _encode(obj, arrays):
    if isinstance(obj, np.ndarray):
        arrays.append(obj)
        return {"__nd__": len(arrays) - 1}
    if isinstance(obj, (np.integer, np.floating, np.bool_)):
        return obj.item()
    if isinstance(obj, dict):
        if all(isinstance(k, str) for k in obj):
            return {k: _encode(v, arrays) for k, v in obj.items()}
        return {
            "__pairs__": [
                [_encode(k, arrays), _encode(v, arrays)] for k, v in obj.items()
            ]
        }
    if isinstance(obj, (list, tuple, set)):
        return [_encode(v, arrays) for v in sorted(obj)] if isinstance(
            obj, set
        ) else [_encode(v, arrays) for v in obj]
    return obj  # int/float/str/bool/None


def _decode(obj, arrays):
    if isinstance(obj, dict):
        if "__nd__" in obj:
            return arrays[obj["__nd__"]]
        if "__pairs__" in obj:
            return {
                _decode(k, arrays): _decode(v, arrays)
                for k, v in obj["__pairs__"]
            }
        return {k: _decode(v, arrays) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(v, arrays) for v in obj]
    return obj


def _dump_npz(data, filename):
    arrays = []
    structure = json.dumps(_encode(data, arrays))
    # Write through a file object: np.savez would otherwise append ".npz" to
    # arbitrary checkpoint names (the settings' .osa-style paths).
    with open(filename, "wb") as f:
        np.savez_compressed(
            f,
            structure=np.frombuffer(structure.encode(), np.uint8),
            **{f"a{i}": a for i, a in enumerate(arrays)},
        )


def _load_npz(filename):
    with np.load(filename, allow_pickle=False) as z:
        structure = json.loads(bytes(z["structure"]).decode())
        n = sum(1 for k in z.files if k.startswith("a"))
        arrays = [z[f"a{i}"] for i in range(n)]
    return _decode(structure, arrays)


def _kf_record(kf):
    return {
        "id": kf.id, "frame_id": kf.frame_id, "timestamp": kf.timestamp,
        "R": kf.R, "t": kf.t, "track_ids": kf.track_ids, "pts": kf.pts,
        "desc": kf.desc, "mp_ids": kf.mp_ids, "covis": kf.covis,
        "parent": kf.parent.id if kf.parent else -1,
        "children": sorted(kf.children), "map_id": kf.map_id,
        "prev_kf": kf.prev_kf.id if kf.prev_kf else -1,
        "next_kf": kf.next_kf.id if kf.next_kf else -1,
        "image": kf.image,
    }


def _mp_record(mp):
    return {
        "id": mp.id, "track_id": mp.track_id, "pos": mp.pos,
        "first_kf_id": mp.first_kf_id, "map_id": mp.map_id, "obs": mp.obs,
        "normal": mp.normal, "min_dist": mp.min_dist, "max_dist": mp.max_dist,
        "n_visible": mp.n_visible, "n_found": mp.n_found,
    }


def save_atlas(atlas, filename):
    data = {"maps": []}
    for m in atlas.all_maps():
        data["maps"].append(
            {
                "id": m.id,
                "init_kf_id": m.init_kf_id,
                "keyframes": [_kf_record(kf) for kf in m.keyframes.values()],
                "mappoints": [_mp_record(mp) for mp in m.mappoints.values()],
                "current": m is atlas.current,
            }
        )
    _dump_npz(data, filename)


def load_atlas(filename):
    data = _load_npz(filename)
    atlas = Atlas()
    atlas.maps.clear()
    max_kf_id = -1
    max_mp_id = -1
    max_map_id = -1
    for mrec in data["maps"]:
        m = Map()
        # Restore the saved map id: kf.map_id/mp.map_id reference it
        # (map_merge.py keeps these aligned); a fresh id would orphan them.
        m.id = mrec["id"]
        max_map_id = max(max_map_id, m.id)
        m.init_kf_id = mrec["init_kf_id"]
        kf_by_id = {}
        for r in mrec["keyframes"]:
            kf = KeyFrame.__new__(KeyFrame)
            kf.id = r["id"]
            kf.frame_id = r["frame_id"]
            kf.timestamp = r["timestamp"]
            kf.R, kf.t = r["R"], r["t"]
            kf.track_ids, kf.pts = r["track_ids"], r["pts"]
            kf.desc = r["desc"]
            kf.ages = None
            kf.mp_ids = r["mp_ids"]
            kf.image = r["image"]
            kf.covis = r["covis"]
            kf.parent = None
            kf.children = set(r["children"])
            kf.bad = False
            kf.map_id = r["map_id"]
            kf.prev_kf = None
            kf.next_kf = None
            kf.depth_right = None
            kf.uright = None
            kf_by_id[kf.id] = kf
            m.keyframes[kf.id] = kf
            max_kf_id = max(max_kf_id, kf.id)
        # resolve pointer fields
        for r in mrec["keyframes"]:
            kf = kf_by_id[r["id"]]
            kf.parent = kf_by_id.get(r["parent"])
            kf.prev_kf = kf_by_id.get(r["prev_kf"])
            kf.next_kf = kf_by_id.get(r["next_kf"])
        for r in mrec["mappoints"]:
            mp = MapPoint.__new__(MapPoint)
            mp.id = r["id"]
            mp.track_id = r["track_id"]
            mp.pos = r["pos"]
            mp.first_kf_id = r["first_kf_id"]
            mp.map_id = r["map_id"]
            mp.obs = r["obs"]
            mp.normal = r["normal"]
            mp.min_dist, mp.max_dist = r["min_dist"], r["max_dist"]
            mp.n_visible, mp.n_found = r["n_visible"], r["n_found"]
            mp.bad = False
            mp.replaced_by = None
            mp.track_in_view = False
            mp.track_proj = np.zeros(2)
            mp.track_depth = 0.0
            mp.last_frame_seen = -1
            m.mappoints[mp.id] = mp
            max_mp_id = max(max_mp_id, mp.id)
        atlas.maps.append(m)
        if mrec["current"]:
            atlas.current = m
    if atlas.current is None and atlas.maps:
        atlas.current = atlas.maps[-1]
    # Restore id counters past the loaded ids.
    import itertools

    KeyFrame._next_id = itertools.count(max_kf_id + 1)
    MapPoint._next_id = itertools.count(max_mp_id + 1)
    Map._next_id = itertools.count(max_map_id + 1)
    return atlas
