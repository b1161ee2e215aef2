"""Checkerboard intrinsics calibration (`metrabs_tf/scripts/calibrate_webcam.py`
equivalent): collect checkerboard detections from a camera or image directory
and solve for the intrinsic matrix + distortion coefficients with OpenCV.

Usage:
  python -m metrabs_tpu.apps.calibrate_camera --images 'calib/*.jpg' \
      --rows 6 --cols 9 --out intrinsics.json
  python -m metrabs_tpu.apps.calibrate_camera --camera-id 0 --n-frames 30 ...
"""

from __future__ import annotations

import argparse
import glob
import json

import numpy as np


def find_corners(gray, rows, cols):
    import cv2
    found, corners = cv2.findChessboardCorners(gray, (cols, rows))
    if not found:
        return None
    # Scale the refinement window to the detected square size: a fixed
    # 11x11 window spans NEIGHBORING edges when the board is small/far
    # (squares < ~25 px) and corrupts corners by multiple pixels.
    pts = corners.reshape(rows, cols, 2)
    spacing = min(
        float(np.median(np.linalg.norm(np.diff(pts, axis=1), axis=-1))),
        float(np.median(np.linalg.norm(np.diff(pts, axis=0), axis=-1))))
    half = int(np.clip(spacing * 0.4, 2, 11))
    criteria = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3)
    return cv2.cornerSubPix(gray, corners, (half, half), (-1, -1), criteria)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--images', default=None, help='glob of calib images')
    parser.add_argument('--camera-id', type=int, default=None)
    parser.add_argument('--n-frames', type=int, default=30)
    parser.add_argument('--rows', type=int, default=6)
    parser.add_argument('--cols', type=int, default=9)
    parser.add_argument('--square-mm', type=float, default=25.0)
    parser.add_argument('--out', default='intrinsics.json')
    args = parser.parse_args(argv)

    import cv2
    objp = np.zeros((args.rows * args.cols, 3), np.float32)
    objp[:, :2] = (np.mgrid[0:args.cols, 0:args.rows].T.reshape(-1, 2)
                   * args.square_mm)

    obj_points, img_points = [], []
    imshape = None
    if args.images:
        for path in sorted(glob.glob(args.images)):
            gray = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if gray is None:
                continue
            imshape = gray.shape
            corners = find_corners(gray, args.rows, args.cols)
            if corners is not None:
                obj_points.append(objp)
                img_points.append(corners)
    elif args.camera_id is not None:
        cap = cv2.VideoCapture(args.camera_id)
        while len(obj_points) < args.n_frames:
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            imshape = gray.shape
            corners = find_corners(gray, args.rows, args.cols)
            if corners is not None:
                obj_points.append(objp)
                img_points.append(corners)
        cap.release()
    else:
        parser.error('Give --images or --camera-id')

    if len(obj_points) < 3:
        raise SystemExit(f'Only {len(obj_points)} checkerboard views found; '
                         'need at least 3.')
    rms, K, dist, _, _ = cv2.calibrateCamera(
        obj_points, img_points, imshape[::-1], None, None)
    result = dict(
        rms_reprojection_error=float(rms),
        intrinsic_matrix=np.asarray(K).tolist(),
        distortion_coeffs=np.asarray(dist).ravel().tolist(),
        image_shape=list(imshape))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
