"""Model families beyond the table bank (DMC, image, exe, ...)."""
