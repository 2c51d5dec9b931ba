"""Time integrators: MM-ADMM, explicit Euler, backward Euler."""
