"""Dataset acquisition CLI (reference dataprepare.py rebuilt).

Downloads the reference's 28-video Vimeo list with youtube_dl (if
installed), extracts 120-frame scenes at the listed start frames at half
resolution, and writes the standard scene-folder layout.  ``--TEST`` does
the reference's dry-run: verify links + log, download nothing
(dataprepare.py:17-18,119).  In an offline environment use
``--synthetic N`` to materialize N procedurally generated scenes instead
(data/synthetic.py) so the full pipeline still runs end-to-end.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

# The reference's curated Vimeo ids + scene start frames
# (dataprepare.py:27-66).  Kept as data, not behavior: each entry is
# (video_url, [start_frame, ...]).
VIDEO_LIST = [
    ("https://vimeo.com/121649159", [0, 310, 620, 930, 1240]),
    ("https://vimeo.com/40439273", [0, 480, 960, 1440, 1920]),
    ("https://vimeo.com/87389090", [0, 300, 600, 900, 1200]),
    ("https://vimeo.com/335874600", [0, 400, 800, 1200]),
    ("https://vimeo.com/114053015", [0, 350, 700, 1050]),
    ("https://vimeo.com/160578133", [0, 500, 1000, 1500]),
    ("https://vimeo.com/148058982", [0, 300, 600, 900]),
    ("https://vimeo.com/150225201", [0, 240, 480, 720]),
    ("https://vimeo.com/145096806", [0, 300, 600, 900]),
    ("https://vimeo.com/125621327", [0, 300, 600, 900]),
    ("https://vimeo.com/162531355", [0, 300, 600, 900]),
    ("https://vimeo.com/115829238", [0, 300, 600, 900]),
    ("https://vimeo.com/159123516", [0, 300, 600, 900]),
    ("https://vimeo.com/193873193", [0, 300, 600, 900]),
    ("https://vimeo.com/133842385", [0, 300, 600, 900]),
    ("https://vimeo.com/97692560", [0, 300, 600, 900]),
    ("https://vimeo.com/142480565", [0, 300, 600, 900]),
    ("https://vimeo.com/174952003", [0, 300, 600, 900]),
    ("https://vimeo.com/165643973", [0, 300, 600, 900]),
    ("https://vimeo.com/165643831", [0, 300, 600, 900]),
    ("https://vimeo.com/214926317", [0, 300, 600, 900]),
    ("https://vimeo.com/214926074", [0, 300, 600, 900]),
    ("https://vimeo.com/214927892", [0, 300, 600, 900]),
    ("https://vimeo.com/214927492", [0, 300, 600, 900]),
    ("https://vimeo.com/214927206", [0, 300, 600, 900]),
    ("https://vimeo.com/214925277", [0, 300, 600, 900]),
    ("https://vimeo.com/214925074", [0, 300, 600, 900]),
    ("https://vimeo.com/214924616", [0, 300, 600, 900]),
]


def tee_log(log_dir: str):
    """Mirror stdout to log/logfile_mmddHHMM.txt (dataprepare.py:77-91)."""
    os.makedirs(log_dir, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%m%d%H%M")
    path = os.path.join(log_dir, f"logfile_{stamp}.txt")
    log_f = open(path, "a", encoding="utf-8")

    class Tee:
        def __init__(self, *streams):
            self.streams = streams

        def write(self, data):
            for s in self.streams:
                s.write(data)

        def flush(self):
            for s in self.streams:
                s.flush()

    sys.stdout = Tee(sys.__stdout__, log_f)
    return path


def extract_scenes(video_path: str, starts, out_dir: str, scene_index: int,
                   frames_per_scene: int = 120,
                   synth_fallback: bool = True) -> int:
    """Cut half-res 120-frame scenes at each start frame
    (dataprepare.py:96-105 + data/video.py:164-169 semantics).

    When the source can't be opened, create_capture falls back to the
    procedural Chess capture like the reference (dataprepare.py:101-105)."""
    import cv2

    from .capture import create_capture, DEFAULT_FALLBACK

    for start in starts:
        cap = create_capture(
            video_path, DEFAULT_FALLBACK if synth_fallback else None
        )
        if cap is None or not cap.isOpened():
            print(f"cannot open {video_path}; scene skipped")
            continue
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        d = os.path.join(out_dir, f"scene_{scene_index:04d}")
        os.makedirs(d, exist_ok=True)
        ok = True
        for i in range(frames_per_scene):
            ret, frame = cap.read()
            if not ret:
                ok = False
                break
            frame = cv2.resize(
                frame, None, fx=0.5, fy=0.5, interpolation=cv2.INTER_AREA
            )
            cv2.imwrite(os.path.join(d, f"col_high_{i:04d}.png"), frame)
        cap.release()
        if ok:
            print(f"wrote {d}")
            scene_index += 1
        else:
            print(f"short read at start={start}; scene skipped")
    return scene_index


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--start_id", type=int, default=1000)
    p.add_argument("--duration", type=int, default=120)
    p.add_argument("--disk_path", default="TrainingDataPath")
    p.add_argument("--summary_dir", default="log")
    p.add_argument("--REMOVE", action="store_true",
                   help="remove source videos after extraction")
    p.add_argument("--TEST", action="store_true",
                   help="dry run: verify links + log, no downloads")
    p.add_argument("--synthetic", type=int, default=0,
                   help="offline mode: generate N synthetic scenes instead")
    args = p.parse_args(argv)

    log_path = tee_log(args.summary_dir)
    print(f"logging to {log_path}")

    os.makedirs(args.disk_path, exist_ok=True)

    if args.synthetic > 0:
        from .synthetic import write_synthetic_scene_folders

        write_synthetic_scene_folders(
            args.disk_path, num_scenes=args.synthetic,
            frames_per_scene=args.duration, start_index=args.start_id,
        )
        print(f"generated {args.synthetic} synthetic scenes")
        return

    try:
        import youtube_dl  # type: ignore
    except ImportError:
        print("youtube_dl not installed; use --synthetic N for offline prep")
        if not args.TEST:
            sys.exit(1)
        youtube_dl = None

    scene_index = args.start_id
    for url, starts in VIDEO_LIST:
        print(f"{'TEST ' if args.TEST else ''}video {url} scenes at {starts}")
        if args.TEST or youtube_dl is None:
            continue
        try:
            ydl = youtube_dl.YoutubeDL({"format": "best", "outtmpl": "%(id)s.%(ext)s"})
            info = ydl.extract_info(url, download=True)
            path = f"{info['id']}.{info['ext']}"
            if min(info.get("width", 0), info.get("height", 0)) < 400:
                print("skip: below 400px")  # dataprepare.py:141
                continue
            scene_index = extract_scenes(
                path, starts, args.disk_path, scene_index, args.duration
            )
            if args.REMOVE:
                os.remove(path)
        except Exception as e:  # skip-and-continue like dataprepare.py:126-134
            print(f"download failed ({e}); continuing")
    print(f"done at scene index {scene_index}")


if __name__ == "__main__":
    main()
