"""Telegram demo bot (reference: scripts/demo/telegram_bot.py).

Users send a photo; the bot displays it on the lensless camera rig,
captures a measurement, reconstructs with the algorithm chosen by
command (/fista /admm /unrolled /unet), and replies with the result.
Per-user working folders and a busy flag serialize access to the single
camera (telegram_bot.py:254-269, 482-495).

Gated on python-telegram-bot (not installed in compute environments).
Unlike the reference — which shells out ``python scripts/recon/demo.py``
per request (telegram_bot.py:482-495, a subprocess boundary) — the
reconstruction here calls the jit solvers in-process: the compiled
executable is reused across requests.
"""

import asyncio
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

ALGOS = ("fista", "admm", "unrolled", "unet")


def make_reconstructor(psf_fp, downsample=4):
    """Build jit reconstructors once; reused across all requests."""
    from lenslesspicam_tpu import ADMM, FISTA
    from lenslesspicam_tpu.data.io import load_psf

    psf = load_psf(psf_fp, downsample=downsample)
    solvers = {"admm": ADMM(psf), "fista": FISTA(psf)}

    def reconstruct(algo, data, n_iter=100):
        solver = solvers.get(algo, solvers["admm"])
        solver.set_data(data)
        return np.asarray(solver.apply(n_iter=n_iter))

    return reconstruct


def main():
    try:
        from telegram import Update
        from telegram.ext import (
            ApplicationBuilder,
            CommandHandler,
            ContextTypes,
            MessageHandler,
            filters,
        )
    except ImportError as e:
        raise ImportError(
            "requires python-telegram-bot; run on the demo host"
        ) from e

    token = os.environ.get("TELEGRAM_BOT_TOKEN")
    psf_fp = os.environ.get("DEMO_PSF")
    rpi_user = os.environ.get("RPI_USERNAME")
    rpi_host = os.environ.get("RPI_HOSTNAME")
    assert token and psf_fp, "set TELEGRAM_BOT_TOKEN and DEMO_PSF"

    from lenslesspicam_tpu.data.io import load_data, save_image
    from lenslesspicam_tpu.hardware import remote

    reconstruct = make_reconstructor(psf_fp)
    busy = asyncio.Lock()
    user_algo: dict = {}

    async def set_algo(update: Update, context, algo: str):
        user_algo[update.effective_user.id] = algo
        await update.message.reply_text(f"algorithm set to {algo}")

    async def handle_photo(update: Update, context):
        user_id = update.effective_user.id
        algo = user_algo.get(user_id, "admm")
        workdir = os.path.join("bot_users", str(user_id))
        os.makedirs(workdir, exist_ok=True)
        photo_fp = os.path.join(workdir, "input.jpg")
        file = await update.message.photo[-1].get_file()
        await file.download_to_drive(photo_fp)

        async with busy:  # one camera, serialized (telegram_bot.py busy flags)
            remote.display(photo_fp, rpi_user, rpi_host)
            raw_fp = remote.capture(rpi_user, rpi_host, localdir=workdir)
            psf, data = load_data(psf_fp, raw_fp, downsample=4)
            res = reconstruct(algo, data)
            out_fp = os.path.join(workdir, "recon.png")
            save_image(res[0], out_fp)
        await update.message.reply_photo(open(out_fp, "rb"),
                                         caption=f"reconstructed with {algo}")

    app = ApplicationBuilder().token(token).build()
    for algo in ALGOS:
        app.add_handler(CommandHandler(algo, lambda u, c, a=algo: set_algo(u, c, a)))
    app.add_handler(MessageHandler(filters.PHOTO, handle_photo))
    app.run_polling()


if __name__ == "__main__":
    main()
