"""CLI alias: ``python -m reinmav_tpu.run`` — mirrors the reference's
``python -m gym_reinmav.run`` entry point (``gym_reinmav/run.py``).
Forwards to :mod:`reinmav_tpu.rl.run`."""

from .rl.run import main

if __name__ == "__main__":
    main()
