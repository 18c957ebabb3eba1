"""Pixel-payload handling: codecs, vegetation-index kernels, Arrow UDFs."""
