"""Settings: typed YAML reader matching the reference schema.

Parses the exact same config files as the reference
(/root/reference/src/Settings.cc:149-199; examples
Examples/Monocular/TartanAir.yaml) — OpenCV FileStorage YAML with a
`File.version: "1.0"` gate, Camera/Stereo/MOVExtractor/Optimizer/Viewer/System
sections, and required/optional semantics (missing required keys raise).
"""
from __future__ import annotations

import dataclasses

import yaml

from ..core.camera import Pinhole

MONOCULAR = 0
STEREO = 1
# Visual-inertial monocular (a capability axis the reference plumbs but never
# feeds — ImuTypes.h:139-249 has no GrabImuData call sites; we complete it).
IMU_MONOCULAR = 3


class SettingsError(RuntimeError):
    pass


class _CvLoader(yaml.SafeLoader):
    """SafeLoader + the `!!opencv-matrix` tag cv::FileStorage emits
    (Stereo.T_c1_c2 in the reference's stereo YAMLs is a 4x4 matrix node)."""


def _cv_matrix(loader, node):
    d = loader.construct_mapping(node, deep=True)
    import numpy as np

    return np.asarray(d["data"], np.float64).reshape(
        int(d["rows"]), int(d["cols"])
    )


_CvLoader.add_constructor("tag:yaml.org,2002:opencv-matrix", _cv_matrix)


def _load_opencv_yaml(path):
    """OpenCV FileStorage YAML: strip the %YAML:1.0 directive pyyaml rejects."""
    with open(path) as f:
        text = f.read()
    lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
    data = yaml.load("\n".join(lines), Loader=_CvLoader)
    if not isinstance(data, dict):
        raise SettingsError(f"empty or malformed settings file: {path}")
    return data


@dataclasses.dataclass
class Settings:
    # camera
    camera_type: str = "PinHole"
    camera1: Pinhole | None = None
    camera2: Pinhole | None = None
    width: int = 640
    height: int = 480
    new_width: int = 640
    new_height: int = 480
    fps: float = 30.0
    rgb: bool = True
    # stereo
    b: float = 0.0  # baseline (m)
    bf: float = 0.0  # baseline * fx
    th_depth: float = 35.0  # close-point threshold in BASELINE units
    # raw (unrectified) stereo rigs: Stereo.T_c1_c2 extrinsics + per-camera
    # rectification (Settings.cc:430-465). rectification holds the R1/R2/
    # P1/P2 + lazily-built remap maps (config/rectify.py).
    need_rectify: bool = False
    T_c1_c2: object = None  # (4,4) cam1->cam2
    rectification: dict | None = None

    @property
    def th_depth_m(self):
        """Close-point depth threshold in meters: mThDepth = b * ThDepth
        (ORB-SLAM3 semantics the reference inherits)."""
        return self.b * self.th_depth
    # MOV extractor
    threshold: int = 25
    coverage_threshold: float = 0.2
    relocalization_distance: float = 0.25
    # optimizer (PnP)
    iteration_count: int = 50
    reprojection_error: float = 5.0
    reprojection_error_lost: float = 8.0
    confidence: float = 0.95
    algorithm: int = 38  # cv::USAC_MAGSAC in the reference; informational here
    # system
    th_far_points: float = 0.0
    load_atlas: str | None = None
    save_atlas: str | None = None
    # viewer
    viewer: dict = dataclasses.field(default_factory=dict)
    sensor: int = MONOCULAR
    # IMU (visual-inertial): noise densities + random walks; EuRoC-style
    # defaults. Parsed from optional IMU.* YAML keys (the reference declares
    # Settings::readIMU but never defines/calls it, Settings.h:159).
    imu_noise_gyro: float = 1.7e-4
    imu_noise_acc: float = 2e-3
    imu_gyro_walk: float = 1.9e-5
    imu_acc_walk: float = 3e-3
    imu_frequency: float = 200.0

    @staticmethod
    def from_yaml(path, sensor=MONOCULAR):
        d = _load_opencv_yaml(path)

        def req(key, cast=float):
            if key not in d:
                raise SettingsError(f"required parameter missing: {key}")
            return cast(d[key])

        def opt(key, default=None, cast=float):
            return cast(d[key]) if key in d else default

        version = opt("File.version", None, str)
        if version != "1.0":
            raise SettingsError(
                f"settings file must declare File.version '1.0', got {version!r}"
            )

        s = Settings(sensor=sensor)
        s.camera_type = req("Camera.type", str)
        if s.camera_type not in ("PinHole", "Rectified"):
            # KannalaBrandt appears in the reference enum but is unhandled
            # there too (Settings.cc:209-271).
            raise SettingsError(f"unsupported camera model: {s.camera_type}")

        s.width = int(req("Camera.width"))
        s.height = int(req("Camera.height"))
        s.new_width = int(opt("Camera.newWidth", s.width))
        s.new_height = int(opt("Camera.newHeight", s.height))
        s.fps = req("Camera.fps")
        s.rgb = bool(int(opt("Camera.RGB", 1)))

        dist = ()
        if s.camera_type == "PinHole":
            dist = (
                opt("Camera1.k1", 0.0),
                opt("Camera1.k2", 0.0),
                opt("Camera1.p1", 0.0),
                opt("Camera1.p2", 0.0),
                opt("Camera1.k3", 0.0),
            )
        # Scale intrinsics on resize (Settings.cc:430-465 rectification map
        # scaling, linear part only).
        sx = s.new_width / s.width
        sy = s.new_height / s.height
        s.camera1 = Pinhole(
            fx=req("Camera1.fx") * sx,
            fy=req("Camera1.fy") * sy,
            cx=req("Camera1.cx") * sx,
            cy=req("Camera1.cy") * sy,
            width=s.new_width,
            height=s.new_height,
            dist=dist,
        )
        if "Camera2.fx" in d:
            dist2 = ()
            if s.camera_type == "PinHole":
                dist2 = (
                    opt("Camera2.k1", 0.0),
                    opt("Camera2.k2", 0.0),
                    opt("Camera2.p1", 0.0),
                    opt("Camera2.p2", 0.0),
                    opt("Camera2.k3", 0.0),
                )
            s.camera2 = Pinhole(
                fx=req("Camera2.fx") * sx,
                fy=req("Camera2.fy") * sy,
                cx=req("Camera2.cx") * sx,
                cy=req("Camera2.cy") * sy,
                width=s.new_width,
                height=s.new_height,
                dist=dist2,
            )

        if sensor == STEREO:
            s.th_depth = req("Stereo.ThDepth")
            if s.camera_type == "Rectified":
                # Pre-rectified rig: baseline given directly
                # (Settings.cc:315-319).
                s.b = req("Stereo.b")
                s.bf = s.b * s.camera1.fx
            else:
                # Raw PinHole rig: extrinsics required, baseline =
                # |translation| (Settings.cc:321-328), then rectification
                # (Settings.cc:430-465) updates camera1 and bf.
                if "Stereo.T_c1_c2" not in d:
                    raise SettingsError(
                        "required parameter missing: Stereo.T_c1_c2 "
                        "(PinHole stereo rigs need extrinsics)"
                    )
                import numpy as np

                T = np.asarray(d["Stereo.T_c1_c2"], np.float64)
                if T.shape != (4, 4):
                    raise SettingsError("Stereo.T_c1_c2 must be 4x4")
                s.T_c1_c2 = T
                s.b = float(np.linalg.norm(T[:3, 3]))
                s.bf = s.b * s.camera1.fx
                if s.camera2 is None:
                    raise SettingsError(
                        "PinHole stereo requires Camera2.* calibration"
                    )
                s._precompute_rectification()

        s.threshold = int(req("MOVExtractor.threshold"))
        s.coverage_threshold = req("MOVExtractor.coverageThreshold")
        s.relocalization_distance = req("MOVExtractor.relocalizationDistance")

        s.iteration_count = int(req("Optimizer.iterationCount"))
        s.reprojection_error = req("Optimizer.reprojectionError")
        s.reprojection_error_lost = req("Optimizer.reprojectionErrorLost")
        s.confidence = req("Optimizer.confidence")
        s.algorithm = int(req("Optimizer.algorithm"))

        s.th_far_points = opt("System.thFarPoints", 0.0)
        s.load_atlas = opt("System.LoadAtlasFromFile", None, str)
        s.save_atlas = opt("System.SaveAtlasToFile", None, str)

        s.imu_noise_gyro = opt("IMU.NoiseGyro", s.imu_noise_gyro)
        s.imu_noise_acc = opt("IMU.NoiseAcc", s.imu_noise_acc)
        s.imu_gyro_walk = opt("IMU.GyroWalk", s.imu_gyro_walk)
        s.imu_acc_walk = opt("IMU.AccWalk", s.imu_acc_walk)
        s.imu_frequency = opt("IMU.Frequency", s.imu_frequency)

        s.viewer = {k: v for k, v in d.items() if k.startswith("Viewer.")}
        return s

    def _precompute_rectification(self):
        """Settings::precomputeRectificationMaps (Settings.cc:430-465):
        Bouguet rectification from T_c1_c2, update camera1 to the rectified
        projection (fx' fy' cx' cy', zero distortion) and bf = b * fx'.
        The maps themselves are built lazily (rectify_maps) — they are only
        needed when images/MV data actually get remapped."""
        import numpy as np

        from .rectify import stereo_rectify

        c1, c2 = self.camera1, self.camera2
        K1 = np.array(
            [[c1.fx, 0, c1.cx], [0, c1.fy, c1.cy], [0, 0, 1]], np.float64
        )
        K2 = np.array(
            [[c2.fx, 0, c2.cx], [0, c2.fy, c2.cy], [0, 0, 1]], np.float64
        )
        # T_c1_c2 maps cam1 coords into cam2's frame? The reference passes
        # Tlr_.inverse() to stereoRectify (Settings.cc:438-443), i.e. the
        # transform whose rotation/translation take LEFT-camera points to
        # RIGHT-camera coordinates.
        T = np.linalg.inv(self.T_c1_c2)
        rect = stereo_rectify(
            K1, tuple(c1.dist or ()), K2, tuple(c2.dist or ()),
            (self.new_width, self.new_height), T[:3, :3], T[:3, 3],
        )
        self.rectification = {
            "K1": K1, "K2": K2,
            "dist1": tuple(c1.dist or ()), "dist2": tuple(c2.dist or ()),
            **rect,
        }
        f = rect["fc_new"]
        P1 = rect["P1"]
        self.camera1 = Pinhole(
            fx=float(P1[0, 0]), fy=float(P1[1, 1]),
            cx=float(P1[0, 2]), cy=float(P1[1, 2]),
            width=self.new_width, height=self.new_height,
        )
        self.camera2 = Pinhole(
            fx=float(P1[0, 0]), fy=float(P1[1, 1]),
            cx=float(P1[0, 2]), cy=float(P1[1, 2]),
            width=self.new_width, height=self.new_height,
        )
        self.bf = self.b * float(f)
        self.need_rectify = True

    def rectify_maps(self):
        """Lazily-built dense remap maps for both cameras:
        {'left': (map_x, map_y), 'right': (map_x, map_y)} — rectified pixel
        -> raw source pixel (config/rectify.py::init_rectify_map)."""
        r = self.rectification
        if r is None:
            return None
        if "maps" not in r:
            from .rectify import init_rectify_map

            size = (self.new_width, self.new_height)
            r["maps"] = {
                "left": init_rectify_map(
                    r["K1"], r["dist1"], r["R1"], r["P1"], size
                ),
                "right": init_rectify_map(
                    r["K2"], r["dist2"], r["R2"], r["P2"], size
                ),
            }
        return r["maps"]
