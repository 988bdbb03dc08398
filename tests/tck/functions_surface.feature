Feature: FunctionsSurface

  Scenario: head, last, tail on lists
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN head(l) AS h, last(l) AS t, tail(l) AS rest, head([]) AS eh
      """
    Then the result should be, in any order:
      | h | t | rest   | eh   |
      | 1 | 3 | [2, 3] | null |
    And no side effects

  Scenario: keys of a node
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', age: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN keys(p) AS ks
      """
    Then the result should be, in any order (ignoring element order for lists):
      | ks              |
      | ['name', 'age'] |
    And no side effects

  Scenario: id is stable within a query
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})-[:R]->(:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P {name: 'a'})-[:R]->(q)
      RETURN id(p) = id(q) AS same, id(p) = id(p) AS self
      """
    Then the result should be, in any order:
      | same  | self |
      | false | true |
    And no side effects

  Scenario: IN across incomparable types is false
    Given an empty graph
    When executing query:
      """
      RETURN 'a' IN [1, 2] AS a, 'a' IN [1, null] AS b, true IN [1, 2] AS c
      """
    Then the result should be, in any order:
      | a     | b    | c     |
      | false | null | false |
    And no side effects

  Scenario: reverse on a list and exists on a property
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN exists(p.name) AS has, reverse([1, 2, 3]) AS rev
      """
    Then the result should be, in any order:
      | has   | rev       |
      | true  | [3, 2, 1] |
      | false | [3, 2, 1] |
    And no side effects
