"""Job plans: retention tier cascade with manifest-based checkpoint/resume."""
