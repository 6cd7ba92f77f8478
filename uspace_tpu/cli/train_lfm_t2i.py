"""T2I training CLI — alias of train_lfm (one loop serves all modes;
the reference splits them: `train_lfm_t2i.py`)."""

from .train_lfm import app, main

if __name__ == "__main__":
    app.run(main)
