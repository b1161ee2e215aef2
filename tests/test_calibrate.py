"""E2E test of the checkerboard calibration app: render a checkerboard
under a KNOWN camera via homography warps, run the CLI, and check the
recovered intrinsics (`metrabs_tf/scripts/calibrate_webcam.py` parity)."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from metrabs_tpu.apps import calibrate_camera

ROWS, COLS = 6, 9
SQ = 40  # board square in px of the flat board image
K_TRUE = np.array([[520.0, 0, 320.0], [0, 520.0, 240.0], [0, 0, 1]],
                  np.float32)


def _flat_board():
    # (COLS+1) x (ROWS+1) squares with a generous white border so the
    # detector sees the full outer edge.
    b = 2 * SQ
    h, w = (ROWS + 1) * SQ + 2 * b, (COLS + 1) * SQ + 2 * b
    img = np.full((h, w), 255, np.uint8)
    for r in range(ROWS + 1):
        for c in range(COLS + 1):
            if (r + c) % 2 == 0:
                img[b + r * SQ:b + (r + 1) * SQ,
                    b + c * SQ:b + (c + 1) * SQ] = 0
    # Inner-corner pixel coordinates on the flat board (x, y), matching
    # the (cols, rows) scan order of cv2.findChessboardCorners object
    # points.
    corners = np.array([[b + (c + 1) * SQ, b + (r + 1) * SQ]
                        for r in range(ROWS) for c in range(COLS)],
                       np.float32)
    return img, corners


def _render_views(tmp_path):
    board, corners_px = _flat_board()
    mm_per_px = 25.0 / SQ  # 25 mm squares
    rng = np.random.default_rng(3)
    # Varied tilts AND off-center positions: planar calibration is
    # degenerate when every view is fronto-parallel and centered.
    poses = [
        (0.0, 0.0, 0.0, 0, 0, 900), (0.45, 0.1, 0.2, 120, -60, 800),
        (-0.3, 0.45, -0.15, -130, 70, 1000), (0.15, -0.5, 0.1, 90, 90, 850),
        (-0.45, -0.2, 0.3, -80, -90, 950), (0.3, 0.35, -0.2, 60, -120, 750),
        (-0.1, -0.4, 0.45, -110, 40, 880), (0.5, -0.15, -0.3, 40, 110, 820),
    ]
    for i, (rx, ry, rz, tx, ty, tz) in enumerate(poses):
        R, _ = cv2.Rodrigues(np.array([rx, ry, rz], np.float64))
        # Board-plane points (mm, z=0) centered on the board.
        ctr = corners_px.mean(axis=0)
        obj = np.concatenate(
            [(corners_px - ctr) * mm_per_px,
             np.zeros((len(corners_px), 1), np.float32)], axis=1)
        t = np.array([[float(tx)], [float(ty)], [float(tz)]])
        # Homography flat-board px -> image px through the known camera.
        board_pts = corners_px[[0, COLS - 1, -1, -COLS]]
        proj, _ = cv2.projectPoints(
            obj[[0, COLS - 1, -1, -COLS]], cv2.Rodrigues(R)[0], t,
            K_TRUE.astype(np.float64), None)
        H, _ = cv2.findHomography(board_pts, proj.reshape(-1, 2))
        img = cv2.warpPerspective(
            board, H, (640, 480), flags=cv2.INTER_AREA,
            borderValue=255)
        # Realistic optical blur: cornerSubPix's gradient refinement needs
        # smooth edges; on razor-sharp aliased synthetic edges it latches
        # onto the staircase and corrupts corners by multiple pixels
        # (measured: calibration RMS 3.5 px / fx -45% without this blur).
        img = cv2.GaussianBlur(img, (5, 5), 1.0)
        cv2.imwrite(str(tmp_path / f'calib_{i}.png'), img)


def test_calibrate_cli_recovers_intrinsics(tmp_path):
    _render_views(tmp_path)
    out = str(tmp_path / 'intr.json')
    calibrate_camera.main([
        '--images', str(tmp_path / 'calib_*.png'),
        '--rows', str(ROWS), '--cols', str(COLS),
        '--square-mm', '25.0', '--out', out])
    with open(out) as f:
        result = json.load(f)
    K = np.asarray(result['intrinsic_matrix'], np.float32)
    # Focal lengths within a few percent, principal point near center.
    np.testing.assert_allclose(K[0, 0], K_TRUE[0, 0], rtol=0.05)
    np.testing.assert_allclose(K[1, 1], K_TRUE[1, 1], rtol=0.05)
    assert abs(K[0, 2] - 320) < 40 and abs(K[1, 2] - 240) < 40
    assert result['rms_reprojection_error'] < 2.0
