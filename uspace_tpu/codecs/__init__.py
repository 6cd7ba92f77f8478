from . import clip_text, convert, vae
