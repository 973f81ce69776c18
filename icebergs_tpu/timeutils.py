"""Date/restart helpers (F21).

Port of ``offset_berg_dates`` (icebergs_framework.F90:1715-1757) and
``yearday`` (4431-4443).  The reference uses the FMS time manager; here
model time is (year, yearday) scalars carried in ModelState.
"""

from __future__ import annotations

import jax.numpy as jnp


def yearday(month, day, hour, minute):
    """Day of year from a 30-day-month calendar (yearday,
    icebergs_framework.F90:4431-4443): the driver's THIRTY_DAY_MONTHS."""
    return (month - 1) * 30. + day + (hour + minute / 60.) / 24.


def offset_berg_dates(st, current_year, current_yearday):
    """Clamp berg birthdays that lie in the future after a restart on an
    earlier model date (offset_berg_dates): shift all start dates back by
    the largest positive offset found."""
    date = st.start_year.astype(st.dtype) * 1000. + st.start_day
    now = current_year * 1000. + current_yearday
    latest = jnp.max(jnp.where(st.alive, date, -jnp.inf))
    off = latest - now
    need = off > 0.

    yr_shift = jnp.floor(off / 1000.)
    day_shift = off - 1000. * yr_shift
    new_year = st.start_year - yr_shift.astype(jnp.int32)
    new_day = st.start_day - day_shift
    # borrow a year where the day went negative
    borrow = new_day < 0.
    new_year = jnp.where(borrow, new_year - 1, new_year)
    new_day = jnp.where(borrow, new_day + 360., new_day)
    return st.replace(
        start_year=jnp.where(need & st.alive, new_year, st.start_year),
        start_day=jnp.where(need & st.alive, new_day, st.start_day))
