Feature: TemporalArithmeticEdge

  # Day-time duration arithmetic edge cases: week parsing, negative and
  # mixed-sign components, duration scaling and negation, date-date
  # subtraction, comparisons across unit spellings, accessor edges, and
  # the documented year/month gate (the engine's durations are exact
  # day-time intervals — calendar-unit arithmetic raises a clean error,
  # reference parity: Morpheus supports no temporal arithmetic at all).

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:T {name: 'x', d: date('2024-02-28'),
                  ts: localdatetime('2024-03-31T22:30:00')})
      """

  Scenario: Week durations are seven days
    When executing query:
      """
      RETURN duration('P2W').days AS d, toString(date('2024-01-01') + duration('P1W')) AS nd
      """
    Then the result should be, in any order:
      | d  | nd           |
      | 14 | '2024-01-08' |
    And no side effects

  Scenario: Mixed-sign duration components normalize
    When executing query:
      """
      WITH duration({days: 2, hours: -1}) AS du
      RETURN du.days AS d, du.hours AS h
      """
    Then the result should be, in any order:
      | d | h  |
      | 1 | 23 |
    And no side effects

  Scenario: Negating a duration
    When executing query:
      """
      WITH -duration('P1DT2H') AS du
      RETURN du.days AS d, toString(date('2024-01-10') + du) AS nd
      """
    Then the result should be, in any order:
      | d  | nd           |
      | -1 | '2024-01-08' |
    And no side effects

  Scenario: Multiplying a duration by an integer
    When executing query:
      """
      WITH duration('PT1H30M') * 2 AS du
      RETURN du.hours AS h, du.minutesOfHour AS m
      """
    Then the result should be, in any order:
      | h | m |
      | 3 | 0 |
    And no side effects

  Scenario: Leap-day crossing with day durations
    When executing query:
      """
      MATCH (t:T)
      RETURN toString(t.d + duration('P1D')) AS leap,
             toString(t.d + duration('P2D')) AS past
      """
    Then the result should be, in any order:
      | leap         | past         |
      | '2024-02-29' | '2024-03-01' |
    And no side effects

  Scenario: Subtracting dates yields a duration
    When executing query:
      """
      RETURN (date('2024-03-05') - date('2024-02-28')).days AS d
      """
    Then the result should be, in any order:
      | d |
      | 6 |
    And no side effects

  Scenario: Duration comparison across unit spellings
    When executing query:
      """
      RETURN duration('P1D') < duration('PT25H') AS lt,
             duration('P1D') = duration('PT24H') AS eq,
             duration('PT90M') = duration('PT1H30M') AS eq2
      """
    Then the result should be, in any order:
      | lt   | eq   | eq2  |
      | true | true | true |
    And no side effects

  Scenario: Datetime minus duration crossing a month boundary
    When executing query:
      """
      MATCH (t:T)
      WITH t.ts - duration('PT23H30M') AS r
      RETURN r.month AS m, r.day AS d, r.hour AS h
      """
    Then the result should be, in any order:
      | m | d  | h  |
      | 3 | 30 | 23 |
    And no side effects

  Scenario: Duration accessors split day and sub-day parts
    When executing query:
      """
      WITH duration('P3DT4H5M6S') AS du
      RETURN du.days AS d, du.hours AS h, du.minutesOfHour AS m,
             du.secondsOfMinute AS s
      """
    Then the result should be, in any order:
      | d | h | m | s |
      | 3 | 4 | 5 | 6 |
    And no side effects

  Scenario: duration.between is signed
    When executing query:
      """
      RETURN duration.between(date('2024-03-05'), date('2024-03-01')).days AS d
      """
    Then the result should be, in any order:
      | d  |
      | -4 |
    And no side effects

  Scenario: Summing durations aggregates exactly
    When executing query:
      """
      UNWIND [duration('PT30M'), duration('PT45M'), duration('PT45M')] AS du
      WITH sum(du) AS total
      RETURN total.hours AS h, total.minutesOfHour AS m
      """
    Then the result should be, in any order:
      | h | m |
      | 2 | 0 |
    And no side effects

  Scenario: Adding a month duration is rejected cleanly
    When executing query:
      """
      RETURN date('2024-01-31') + duration('P1M') AS d
      """
    Then a SyntaxError should be raised

  Scenario: Mixing calendar and day-time components is rejected cleanly
    When executing query:
      """
      RETURN duration('P1Y2DT3H') + duration('P1D') AS d
      """
    Then a SyntaxError should be raised

  Scenario: Date truncation to week starts on Monday
    When executing query:
      """
      RETURN toString(date.truncate('week', date('2024-03-05'))) AS t,
             toString(date.truncate('week', date('2024-03-04'))) AS mon
      """
    Then the result should be, in any order:
      | t            | mon          |
      | '2024-03-04' | '2024-03-04' |
    And no side effects

  Scenario: Ordering by duration values
    When executing query:
      """
      UNWIND [duration('PT25H'), duration('P1D'), duration('PT1M')] AS du
      RETURN du.days AS d, du.hours AS h ORDER BY du
      """
    Then the result should be, in order:
      | d | h |
      | 0 | 0 |
      | 1 | 0 |
      | 1 | 1 |
    And no side effects

  Scenario: Null propagates through temporal arithmetic
    When executing query:
      """
      MATCH (t:T)
      RETURN t.missing + duration('P1D') AS a, t.d + t.nothing AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects
