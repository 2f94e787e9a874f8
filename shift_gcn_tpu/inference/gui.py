"""Minimal Tkinter front-end for the fall-detection pipeline.

Parity feature with the reference's GUI (inference_pipeline.py:677-823):
pick a video, pick the checkpoint directory, run the pipeline, display the
report summary.  Import-gated; training hosts never need Tk.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict


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
                report = run_pipeline(
                    video, {"joint": ckpt},
                    threshold=float(threshold_var.get()),
                    output_json=os.path.splitext(video)[0] + "_report.json")
                summary = {k: v for k, v in report.items()
                           if k != "frame_probabilities"}
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
    tk.Button(row3, text="run", command=run).pack(side="right")

    output = scrolledtext.ScrolledText(root)
    output.pack(expand=True, fill="both", padx=8, pady=8)

    root.mainloop()


if __name__ == "__main__":
    launch()
