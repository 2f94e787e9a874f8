"""Minimal Tkinter front-end for the fall-detection pipeline.

Parity feature with the reference's GUI (inference_pipeline.py:677-823):
pick a video, pick the save-models root, run the 4-stream ensemble with
per-modality checkpoint auto-detection (reference :28-38, :677-823),
optionally write the annotated video, display the report summary.
Import-gated; training hosts never need Tk.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional


def resolve_checkpoints(path: str):
    """A user-picked path -> pipeline checkpoint arguments.

    Returns (checkpoints_dict, fourstream_path): auto-detect per-modality
    run dirs / reference .pt files under a save root; a single run dir
    (or a fourstream run), a concrete Orbax step dir, and a reference
    .pt/.pkl file are all used directly.
    """
    from shift_gcn_tpu.inference.pipeline import auto_detect_checkpoints
    from shift_gcn_tpu.utils.checkpoint import latest_checkpoint

    def is_fourstream(p: str) -> bool:
        return "fourstream" in os.path.basename(os.path.normpath(p)).lower()

    # a reference torch weights file, used directly (EnsemblePredictor
    # imports .pt/.pkl/.pth itself)
    if os.path.isfile(path) and path.endswith((".pt", ".pkl", ".pth")):
        return {"joint": path}, None
    # a concrete Orbax step dir (digit-named) — the pipeline loader
    # accepts it verbatim
    if os.path.isdir(path) and os.path.basename(
            os.path.normpath(path)).isdigit():
        parent = os.path.dirname(os.path.normpath(path))
        if is_fourstream(parent):
            return None, path
        return {"joint": path}, None
    found = auto_detect_checkpoints(path)
    if found:
        return found, None
    latest = latest_checkpoint(path)
    if latest:
        if is_fourstream(path):
            return None, latest
        return {"joint": latest}, None
    return None, None


def launch(default_checkpoints: Dict[str, str] | None = None) -> None:
    import tkinter as tk
    from tkinter import filedialog, messagebox, scrolledtext

    from shift_gcn_tpu.inference.pipeline import run_pipeline

    root = tk.Tk()
    root.title("shift_gcn_tpu fall detection")
    root.geometry("640x480")

    video_var = tk.StringVar()
    ckpt_var = tk.StringVar(
        value=(default_checkpoints or {}).get("joint", ""))
    threshold_var = tk.DoubleVar(value=0.5)
    annotate_var = tk.BooleanVar(value=False)

    def pick_video():
        path = filedialog.askopenfilename(
            filetypes=[("videos", "*.mp4 *.avi *.mkv"), ("all", "*")])
        if path:
            video_var.set(path)

    def pick_ckpt():
        path = filedialog.askdirectory()
        if path:
            ckpt_var.set(path)

    output = None  # assigned below

    def run():
        video = video_var.get()
        ckpt = ckpt_var.get()
        if not video or not ckpt:
            messagebox.showerror("error", "select a video and a checkpoint")
            return

        def work():
            try:
                ckpts, fourstream = resolve_checkpoints(ckpt)
                if ckpts is None and fourstream is None:
                    raise FileNotFoundError(
                        f"no checkpoints found under {ckpt}")
                out_video = (os.path.splitext(video)[0] + "_annotated.mp4"
                             if annotate_var.get() else None)
                report = run_pipeline(
                    video, ckpts, fourstream_checkpoint=fourstream,
                    threshold=float(threshold_var.get()),
                    output_json=os.path.splitext(video)[0] + "_report.json",
                    output_video=out_video)
                summary = {k: v for k, v in report.items()
                           if k != "frame_probabilities"}
                summary["streams"] = sorted(ckpts) if ckpts else [
                    "fourstream"]
                output.delete("1.0", tk.END)
                output.insert(tk.END, json.dumps(summary, indent=2))
            except Exception as e:  # surface errors in the UI
                output.delete("1.0", tk.END)
                output.insert(tk.END, f"ERROR: {e}")

        threading.Thread(target=work, daemon=True).start()
        output.delete("1.0", tk.END)
        output.insert(tk.END, "running...")

    row = tk.Frame(root)
    row.pack(fill="x", padx=8, pady=4)
    tk.Entry(row, textvariable=video_var).pack(
        side="left", expand=True, fill="x")
    tk.Button(row, text="video...", command=pick_video).pack(side="right")

    row2 = tk.Frame(root)
    row2.pack(fill="x", padx=8, pady=4)
    tk.Entry(row2, textvariable=ckpt_var).pack(
        side="left", expand=True, fill="x")
    tk.Button(row2, text="checkpoint...", command=pick_ckpt).pack(
        side="right")

    row3 = tk.Frame(root)
    row3.pack(fill="x", padx=8, pady=4)
    tk.Label(row3, text="threshold").pack(side="left")
    tk.Scale(row3, variable=threshold_var, from_=0.1, to=0.9,
             resolution=0.05, orient="horizontal").pack(
        side="left", expand=True, fill="x")
    tk.Checkbutton(row3, text="annotated video",
                   variable=annotate_var).pack(side="right")
    tk.Button(row3, text="run", command=run).pack(side="right")

    output = scrolledtext.ScrolledText(root)
    output.pack(expand=True, fill="both", padx=8, pady=8)

    root.mainloop()


if __name__ == "__main__":
    launch()
