"""Model zoo: one Application per reference problem family."""
